"""Native C++ host-ops library tests: build it, then check exact agreement
with the numpy reference implementations (the reference's pure C++ unit
tests tier, SURVEY.md §4.1)."""

import numpy as np
import pytest

from vision_tpu import native
from vision_tpu.image import Image, ImageFormat, image_blur, image_erosion, image_load_array

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_version_and_error():
    lib = native.lib()
    assert lib.visp_version() == 100
    lib.visp_set_last_error(b"boom")
    assert lib.visp_get_last_error() == b"boom"


def test_box_blur_matches_numpy(rng):
    from vision_tpu.image.image import _box_blur_axis

    a = rng.random((17, 23, 4)).astype(np.float32)
    for radius in (1, 3, 7):
        expected = _box_blur_axis(_box_blur_axis(a, radius, axis=1), radius, axis=0)
        actual = native.box_blur_native(a, radius)
        np.testing.assert_allclose(actual, expected, atol=1e-5)


def test_blur_through_image_layer(rng):
    a = rng.random((16, 16, 1)).astype(np.float32)
    out = image_blur(image_load_array(a, ImageFormat.alpha_f32), 2)
    assert out.data.shape == (16, 16, 1)
    np.testing.assert_allclose(
        image_blur(image_load_array(np.full((8, 8, 1), 0.5, np.float32), ImageFormat.alpha_f32), 2).data,
        0.5,
        atol=1e-6,
    )


def test_erosion_matches_numpy(rng):
    """Native kernel AND the image-layer numpy fallback both against an
    INDEPENDENT brute-force oracle (image_erosion routes through the native
    kernel when available, so comparing against it alone would be the C
    code checking itself; review r4c)."""
    a = rng.random((12, 15)).astype(np.float32)
    r = 2
    # brute force: min over the replicate-padded (2r+1)^2 neighborhood
    p = np.pad(a, r, mode="edge")
    expected = np.empty_like(a)
    for y in range(a.shape[0]):
        for x in range(a.shape[1]):
            expected[y, x] = p[y : y + 2 * r + 1, x : x + 2 * r + 1].min()

    actual = native.erosion_native(a, r)
    np.testing.assert_allclose(actual, expected, atol=1e-7)

    # the u8 input path takes image.py's separable-numpy fallback — same
    # oracle (min of u8 == min of scaled f32)
    u8 = (a * 255).astype(np.uint8)
    out_u8 = image_erosion(image_load_array(u8[:, :, None], ImageFormat.alpha_u8), r)
    p8 = np.pad(u8, r, mode="edge")
    exp8 = np.empty_like(u8)
    for y in range(u8.shape[0]):
        for x in range(u8.shape[1]):
            exp8[y, x] = p8[y : y + 2 * r + 1, x : x + 2 * r + 1].min()
    np.testing.assert_array_equal(out_u8.data[:, :, 0], exp8)


def test_nms_matches_python(rng):
    n = 200
    boxes = rng.random((n, 4)).astype(np.float32) * 100
    boxes[:, 2:] = boxes[:, :2] + rng.random((n, 2)).astype(np.float32) * 50 + 1
    scores = rng.random(n).astype(np.float32)
    cls = rng.integers(0, 5, n).astype(np.int32)

    kept = native.nms_native(boxes, scores, cls, 0.45)

    # python reference (same algorithm as models/yolov9t.py fallback)
    order = np.argsort(-scores, kind="stable")
    alive = np.ones(n, bool)
    expected = []
    for ii, i in enumerate(order):
        if not alive[i]:
            continue
        expected.append(int(i))
        ci = cls[i] * 7680
        b1 = [boxes[i][0] + ci, boxes[i][1], boxes[i][2] + ci, boxes[i][3]]
        a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
        for j in order[ii + 1 :]:
            if not alive[j]:
                continue
            cj = cls[j] * 7680
            b2 = [boxes[j][0] + cj, boxes[j][1], boxes[j][2] + cj, boxes[j][3]]
            ix = max(0.0, min(b1[2], b2[2]) - max(b1[0], b2[0]))
            iy = max(0.0, min(b1[3], b2[3]) - max(b1[1], b2[1]))
            inter = ix * iy
            a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
            if inter / (a1 + a2 - inter + 1e-9) > 0.45:
                alive[j] = False
    assert kept == expected[:300]


def test_yolo_nms_uses_native(rng, monkeypatch):
    """End-to-end: non_max_suppression through the native path agrees
    box-for-box with the python fallback (forced by stubbing nms_native to
    None; review r4c — the old test asserted neither routing nor parity)."""
    import vision_tpu.native as nat
    from vision_tpu.models import yolov9t as y

    assert nat.available(), "native lib must be present for the routing test"
    n = 120
    boxes = rng.random((n, 4)).astype(np.float32) * 80
    boxes[:, 2:] = boxes[:, :2] + rng.random((n, 2)).astype(np.float32) * 40 + 1
    scores = (rng.random((n, 3)) * 0.9).astype(np.float32)

    via_native = y.non_max_suppression(boxes, scores, 0.25, 0.45)
    monkeypatch.setattr(nat, "nms_native", lambda *a, **k: None)
    via_python = y.non_max_suppression(boxes, scores, 0.25, 0.45)
    assert len(via_native) == len(via_python) > 0
    for a, b in zip(via_native, via_python):
        assert (a.x1, a.y1, a.x2, a.y2, a.class_id) == (b.x1, b.y1, b.x2, b.y2, b.class_id)


def test_u8_to_f32_matches_image_layer(rng):
    """Native pixel conversion == image_u8_to_f32 bit-for-bit, including
    tiled replicate-padded reads, channel maps, and the 1/255 missing-lane
    semantics of the reference u8 load (image-impl.h:22-26)."""
    from vision_tpu.image import channel_map, image_u8_to_f32

    src = Image(rng.integers(0, 256, (9, 7, 3), np.uint8), ImageFormat.rgb_u8)
    offset = (-0.485, -0.456, -0.406)
    scale = (1 / 0.229, 1 / 0.224, 1 / 0.225)
    ref = image_u8_to_f32(
        src, ImageFormat.rgb_f32, offset=offset, scale=scale,
        tile_offset=(3, 4), dst_extent=(8, 8),
    )
    got = native.u8_to_f32_native(
        src.data, 3, offset=offset + (0.0,), scale=scale + (1.0,),
        tile_offset=(3, 4), dst_extent=(8, 8),
    )
    if got is None:
        pytest.skip("native lib unavailable")
    np.testing.assert_array_equal(got, ref.data)

    # bgra source with channel map + missing-lane alpha (rgb u8 -> rgba f32)
    bgra = Image(rng.integers(0, 256, (5, 6, 4), np.uint8), ImageFormat.bgra_u8)
    ref2 = image_u8_to_f32(bgra, ImageFormat.rgba_f32)
    got2 = native.u8_to_f32_native(bgra.data, 4, chmap=channel_map(ImageFormat.bgra_u8))
    np.testing.assert_array_equal(got2, ref2.data)

    rgb3 = Image(rng.integers(0, 256, (4, 4, 3), np.uint8), ImageFormat.rgb_u8)
    ref3 = image_u8_to_f32(rgb3, ImageFormat.rgba_f32)  # lane 3 = 1/255
    got3 = native.u8_to_f32_native(rgb3.data, 4)
    np.testing.assert_array_equal(got3, ref3.data)

    # 1-channel source splats to every lane (image-impl.h alpha/gray load)
    gray = Image(rng.integers(0, 256, (5, 4, 1), np.uint8), ImageFormat.alpha_u8)
    ref4 = image_u8_to_f32(gray, ImageFormat.rgba_f32)
    got4 = native.u8_to_f32_native(gray.data, 4)
    np.testing.assert_array_equal(got4, ref4.data)

    # rgb 3-tuple offset/scale pad a neutral 4th lane, like the numpy twin
    got5 = native.u8_to_f32_native(
        src.data, 3, offset=offset, scale=scale, tile_offset=(3, 4), dst_extent=(8, 8)
    )
    np.testing.assert_array_equal(got5, ref.data)


def test_f32_to_u8_matches_image_layer(rng):
    """Native store == image_f32_to_u8 (clamp, *255, truncate) on the
    4-lane intermediate."""
    from vision_tpu.image import image_f32_to_u8

    src = Image((rng.random((6, 5, 4)) * 1.4 - 0.2).astype(np.float32), ImageFormat.rgba_f32)
    ref = image_f32_to_u8(src, ImageFormat.rgba_u8, scale=0.5, offset=0.5)
    got = native.f32_to_u8_native(src.load_f32x4(), 4, scale=0.5, offset=0.5)
    if got is None:
        pytest.skip("native lib unavailable")
    np.testing.assert_array_equal(got, ref.data)


def test_tile_merge_matches_tiling_engine(rng):
    """Native overlap-blend accumulate == the tiling engine's merge for a
    full multi-tile reconstruction (reference image.cpp:655-693)."""
    from vision_tpu.image.tiling import TileLayout, tile_merge, tile_weights

    img = rng.random((40, 56, 3)).astype(np.float32)
    layout = TileLayout((56, 40), 32, overlap=8, align=8)
    ref = Image(np.zeros_like(img), ImageFormat.rgb_f32)
    nat = np.zeros_like(img)
    used_native = True
    for t in range(layout.total()):
        coord = layout.coord(t)
        beg, end = layout.start(coord), layout.end(coord)
        h, w = end[1] - beg[1], end[0] - beg[0]
        # a full aligned tile whose in-bounds region is the source crop
        tile = np.zeros((layout.tile_size[1], layout.tile_size[0], 3), np.float32)
        tile[:h, :w] = img[beg[1] : end[1], beg[0] : end[0]]
        tile_merge(Image(tile, ImageFormat.rgb_f32), ref, coord, layout)
        blend = tile_weights(layout, coord)
        ok = native.tile_merge_native(tile[:h, :w], blend, nat, beg)
        used_native = used_native and ok
    if not used_native:
        pytest.skip("native lib unavailable")
    np.testing.assert_allclose(nat, ref.data, atol=1e-6)
    np.testing.assert_allclose(ref.data, img, atol=1e-5)  # weights sum to 1

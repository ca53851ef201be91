"""Image layer tests — ports of the reference's pure C++ unit tests
(tests/test-image.cpp: format math, conversions, scale, composite, tiling)."""

import numpy as np
import pytest

from vision_tpu.image import (
    Image,
    ImageFormat,
    TileLayout,
    image_alloc,
    image_alpha_composite,
    image_blur,
    image_difference_rms,
    image_erosion,
    image_estimate_foreground,
    image_f32_to_u8,
    image_load,
    image_load_array,
    image_normalize,
    image_save,
    image_scale,
    image_set_alpha,
    image_to_mask,
    image_u8_to_f32,
    n_channels,
    tile_merge,
    tile_scale,
)


def test_format_helpers():
    assert n_channels(ImageFormat.rgba_u8) == 4
    assert n_channels(ImageFormat.rgb_f32) == 3
    assert n_channels(ImageFormat.alpha_u8) == 1


def test_load_save_roundtrip(tmp_path, rng):
    a = rng.integers(0, 256, (13, 17, 3)).astype(np.uint8)
    img = image_load_array(a)
    p = tmp_path / "img.png"
    image_save(img, p)
    back = image_load(p)
    np.testing.assert_array_equal(back.data, a)
    assert back.format == ImageFormat.rgb_u8


def test_u8_to_f32_basic():
    a = np.array([[[0, 128, 255]]], np.uint8)
    out = image_u8_to_f32(image_load_array(a), ImageFormat.rgb_f32)
    np.testing.assert_allclose(out.data[0, 0], [0.0, 128 / 255, 1.0], atol=1e-6)


def test_u8_to_f32_offset_scale():
    """ImageNet-style normalize: (v/255 + offset) * scale."""
    a = np.full((2, 2, 3), 255, np.uint8)
    out = image_u8_to_f32(
        image_load_array(a),
        ImageFormat.rgb_f32,
        offset=(-0.485, -0.456, -0.406, 0.0),
        scale=(1 / 0.229, 1 / 0.224, 1 / 0.225, 1.0),
    )
    exp = [(1 - 0.485) / 0.229, (1 - 0.456) / 0.224, (1 - 0.406) / 0.225]
    np.testing.assert_allclose(out.data[0, 0], exp, rtol=1e-5)


def test_u8_to_f32_tile_offset_and_pad():
    """Tiled reads clamp-replicate beyond the source (image.cpp:219-226)."""
    src = image_load_array(np.arange(16, dtype=np.uint8).reshape(4, 4, 1))
    out = image_u8_to_f32(src, ImageFormat.alpha_f32, tile_offset=(2, 2), dst_extent=(4, 4))
    expected = np.array(
        [[10, 11, 11, 11], [14, 15, 15, 15], [14, 15, 15, 15], [14, 15, 15, 15]], np.float32
    ) / 255.0
    np.testing.assert_allclose(out.data[:, :, 0], expected, atol=1e-6)


def test_u8_to_f32_bgra_channel_map():
    a = np.zeros((1, 1, 4), np.uint8)
    a[0, 0] = [10, 20, 30, 40]  # B G R A in bgra format
    img = image_load_array(a, ImageFormat.bgra_u8)
    out = image_u8_to_f32(img, ImageFormat.rgba_f32)
    np.testing.assert_allclose(out.data[0, 0] * 255, [30, 20, 10, 40], atol=1e-4)


def test_u8_to_f32_argb_channel_map():
    """argb lane order (reference image_argb_u8_to_rgb_f32,
    test-image.cpp:132-146): stored A R G B reads back as rgb."""
    a = np.zeros((1, 1, 4), np.uint8)
    a[0, 0] = [40, 30, 20, 10]  # A R G B in argb format
    img = image_load_array(a, ImageFormat.argb_u8)
    out = image_u8_to_f32(img, ImageFormat.rgba_f32)
    np.testing.assert_allclose(out.data[0, 0] * 255, [30, 20, 10, 40], atol=1e-4)
    out3 = image_u8_to_f32(img, ImageFormat.rgb_f32)
    np.testing.assert_allclose(out3.data[0, 0] * 255, [30, 20, 10], atol=1e-4)


def test_f32_to_u8_clamp_truncate():
    a = np.array([[[-0.5, 0.5, 1.5]]], np.float32)
    out = image_f32_to_u8(image_load_array(a, ImageFormat.rgb_f32), ImageFormat.rgb_u8)
    np.testing.assert_array_equal(out.data[0, 0], [0, 127, 255])


def test_to_mask_and_set_alpha():
    a = np.zeros((2, 2, 4), np.uint8)
    a[:, :, 0] = 77
    mask = image_to_mask(image_load_array(a))
    assert mask.format == ImageFormat.alpha_u8
    assert (mask.data == 77).all()
    img = image_load_array(np.full((2, 2, 4), 10, np.uint8))
    image_set_alpha(img, mask)
    assert (img.data[:, :, 3] == 77).all()
    assert (img.data[:, :, :3] == 10).all()


def test_scale_f32():
    a = np.zeros((2, 2, 1), np.float32)
    a[0, 0, 0] = 1.0
    out = image_scale(image_load_array(a, ImageFormat.alpha_f32), (4, 4))
    assert out.extent == (4, 4)
    assert out.data[0, 0, 0] == pytest.approx(1.0, abs=1e-5)
    assert out.data.mean() == pytest.approx(0.25, abs=0.05)


def test_scale_u8_identity():
    a = np.random.default_rng(0).integers(0, 255, (8, 8, 3)).astype(np.uint8)
    out = image_scale(image_load_array(a), (8, 8))
    np.testing.assert_array_equal(out.data, a)


def test_blur_constant_preserved():
    a = np.full((16, 16, 1), 0.7, np.float32)
    out = image_blur(image_load_array(a, ImageFormat.alpha_f32), radius=3)
    np.testing.assert_allclose(out.data, 0.7, atol=1e-5)


def test_blur_matches_naive():
    rng = np.random.default_rng(1)
    a = rng.random((9, 11, 1)).astype(np.float32)
    r = 2
    out = image_blur(image_load_array(a, ImageFormat.alpha_f32), radius=r)
    # naive: box filter over edge-replicated signal
    pad = np.pad(a, ((r, r), (r, r), (0, 0)), mode="edge")
    naive = np.zeros_like(a)
    for y in range(a.shape[0]):
        for x in range(a.shape[1]):
            naive[y, x, 0] = pad[y : y + 2 * r + 1, x : x + 2 * r + 1, 0].mean()
    np.testing.assert_allclose(out.data, naive, atol=1e-4)


def test_erosion():
    a = np.ones((5, 5, 1), np.float32)
    a[2, 2, 0] = 0.0
    out = image_erosion(image_load_array(a, ImageFormat.alpha_f32), radius=1)
    assert out.data[1:4, 1:4].max() == 0.0
    assert out.data[0, 0, 0] == 1.0


def test_normalize():
    a = np.array([[[2.0], [4.0]], [[6.0], [10.0]]], np.float32)
    out = image_normalize(image_load_array(a, ImageFormat.alpha_f32), 0.0, 1.0)
    np.testing.assert_allclose(out.data[:, :, 0], [[0.0, 0.25], [0.5, 1.0]], atol=1e-6)


def test_difference_rms():
    a = image_load_array(np.zeros((4, 4, 3), np.uint8))
    b = image_load_array(np.full((4, 4, 3), 255, np.uint8))
    # per-pixel lanes {r,g,b,1}: diff = {1,1,1,0} -> dot 3 -> rms sqrt(3)
    assert image_difference_rms(a, b) == pytest.approx(np.sqrt(3.0), abs=1e-5)
    assert image_difference_rms(a, a) == 0.0


def test_alpha_composite():
    fg = image_load_array(np.full((2, 2, 4), 200, np.uint8))
    bg = image_load_array(np.full((2, 2, 3), 100, np.uint8))
    mask = image_load_array(np.full((2, 2, 1), 255, np.uint8), ImageFormat.alpha_u8)
    out = image_alpha_composite(fg, bg, mask)
    assert (out.data[:, :, :3] == 200).all()
    mask0 = image_load_array(np.zeros((2, 2, 1), np.uint8), ImageFormat.alpha_u8)
    out0 = image_alpha_composite(fg, bg, mask0)
    assert (out0.data[:, :, :3] == 100).all()
    assert (out0.data[:, :, 3] == 255).all()


def test_estimate_foreground_shape():
    rng = np.random.default_rng(3)
    img = image_load_array(rng.random((64, 64, 4)).astype(np.float32), ImageFormat.rgba_f32)
    mask = image_load_array((rng.random((64, 64, 1)) > 0.5).astype(np.float32), ImageFormat.alpha_f32)
    fg = image_estimate_foreground(img, mask, radius=8)
    assert fg.format == ImageFormat.rgba_f32
    assert fg.extent == (64, 64)
    np.testing.assert_allclose(fg.data[:, :, 3], mask.data[:, :, 0], atol=1e-6)


# -- tiling (reference test-image.cpp tiling cases + image.cpp:609-693) --


def test_tile_layout_basic():
    lay = TileLayout((512, 512), 224, overlap=16, align=16)
    assert lay.n_tiles == (3, 3)
    # tile size is ceil-aligned to 16
    assert lay.tile_size[0] % 16 == 0
    # tiles cover the image
    last = (lay.n_tiles[0] - 1, lay.n_tiles[1] - 1)
    assert lay.end(last) == (512, 512)
    assert lay.start((0, 0)) == (0, 0)


def test_tile_layout_single_tile():
    lay = TileLayout((100, 100), 224, overlap=16, align=16)
    assert lay.n_tiles == (1, 1)
    assert lay.end((0, 0)) == (100, 100)


def test_tile_scale():
    lay = TileLayout((512, 512), 224, overlap=16, align=16)
    s = tile_scale(lay, 4)
    assert s.image_extent == (2048, 2048)
    assert s.overlap == (64, 64)
    assert s.tile_size == (lay.tile_size[0] * 4, lay.tile_size[1] * 4)


def test_tile_merge_blends_to_one():
    """Merging constant-1 tiles must reconstruct constant 1 everywhere."""
    lay = TileLayout((300, 200), 128, overlap=16, align=16)
    dst = image_alloc((300, 200), ImageFormat.rgb_f32)
    for i in range(lay.total()):
        c = lay.coord(i)
        tw, th = lay.tile_size
        tile = image_load_array(np.ones((th, tw, 3), np.float32), ImageFormat.rgb_f32)
        tile_merge(tile, dst, c, lay)
    np.testing.assert_allclose(dst.data, 1.0, atol=1e-5)


def test_tile_merge_reconstructs_image():
    """Cutting an image into overlapping tiles then merging reproduces it."""
    rng = np.random.default_rng(7)
    src = rng.random((200, 300, 3)).astype(np.float32)
    lay = TileLayout((300, 200), 128, overlap=16, align=16)
    dst = image_alloc((300, 200), ImageFormat.rgb_f32)
    for i in range(lay.total()):
        c = lay.coord(i)
        sx, sy = lay.start(c)
        tw, th = lay.tile_size
        # crop with replicate padding (like image_u8_to_f32 tiled read)
        ys = np.minimum(np.arange(sy, sy + th), 199)
        xs = np.minimum(np.arange(sx, sx + tw), 299)
        tile = image_load_array(src[np.ix_(ys, xs)], ImageFormat.rgb_f32)
        tile_merge(tile, dst, c, lay)
    np.testing.assert_allclose(dst.data, src, atol=1e-5)


def test_image_scale_stb_properties(rng):
    """stb-compatible path (Catmull-Rom + sRGB): identity on constants,
    preserves range, matches PIL roughly on smooth content."""
    const = image_load_array(np.full((16, 16, 3), 128, np.uint8))
    out = image_scale(const, (9, 7), method="stb")
    assert out.extent == (9, 7)
    assert int(out.data.min()) >= 127 and int(out.data.max()) <= 129

    grad = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None], (32, 1, 3))
    img = image_load_array(grad)
    stb = image_scale(img, (32, 16), method="stb")
    pil = image_scale(img, (32, 16))
    diff = np.abs(stb.data.astype(int) - pil.data.astype(int))
    assert diff.mean() < 12  # same image, different filter/colorspace

    # alpha premultiply: fully transparent region's color must not bleed
    rgba = np.zeros((16, 16, 4), np.uint8)
    rgba[:, :8] = [255, 0, 0, 255]
    rgba[:, 8:] = [0, 255, 0, 0]  # transparent green
    out = image_scale(image_load_array(rgba), (8, 8), method="stb")
    left = out.data[:, :3]
    assert (left[:, :, 0].astype(int) > 200).all()  # red survives
    assert (left[:, :, 1].astype(int) < 40).all()  # green does not bleed in


def test_sam_compute_batch():
    """Batched prompt decode matches per-prompt decode."""
    from vision_tpu.core.device import BackendType, backend_init
    from vision_tpu.models.mobile_sam import SamModel, SamParams
    from vision_tpu.models.random_weights import random_mobile_sam_params

    dev = backend_init(BackendType.cpu)
    params = {k: np.asarray(v) for k, v in random_mobile_sam_params(0).items()}
    model = SamModel(params, SamParams(), dev)
    img = image_load_array(np.random.default_rng(4).integers(0, 256, (96, 128, 3)).astype(np.uint8))
    model.encode(img)
    pts = [(30, 30), (90, 60)]
    batch = model.compute_batch(points=pts)
    singles = [model.compute(point=p) for p in pts]
    assert len(batch) == 2
    for b, s in zip(batch, singles):
        np.testing.assert_array_equal(b.data, s.data)


def test_stb_resize_mask_filters_linearly():
    """stb v1 treats a 1-channel image's sole channel as the ALPHA channel
    (reference alpha_channel()=0): it filters linearly, without the sRGB
    decode/encode applied to color channels. A 0/255 edge midpoint must
    land near 128 (linear), not ~188 (sRGB-space filtering)."""
    from vision_tpu.image import Image, ImageFormat, image_scale

    a = np.zeros((2, 16, 1), np.uint8)
    a[:, 8:] = 255
    out = image_scale(Image(a, ImageFormat.alpha_u8), (8, 2), "stb")
    mid = int(out.data[0, 3, 0]), int(out.data[0, 4, 0])
    # the transition pixels straddle 50%: linear filtering keeps them
    # symmetric around ~127/128; sRGB-space filtering would push ~188
    assert all(20 < v < 235 for v in mid)
    assert abs((mid[0] + mid[1]) / 2 - 127.5) < 24.0, mid


def test_stb_resize_downscale_uses_scaled_filter():
    """FILTER_DEFAULT resolves per axis: scaled Mitchell when minifying.
    A 4x downscale of an impulse must spread over > 4 source-pixel support
    (the unscaled 4-tap kernel would keep it in 2 output pixels)."""
    from vision_tpu.ops.resize import resize_matrix

    w = resize_matrix(64, 16, "mitchell", False)
    row = w[8]
    assert (np.abs(row) > 1e-6).sum() >= 8  # scaled support
    np.testing.assert_allclose(row.sum(), 1.0, atol=1e-5)  # normalized


def test_stb_resize_preserves_transparent_color():
    """STBIR_ALPHA_EPSILON semantics: fully transparent pixels keep their
    color through the resize (premultiply by alpha+eps, unpremultiply by
    the filtered value) instead of being zeroed."""
    from vision_tpu.image import Image, ImageFormat, image_scale

    a = np.zeros((8, 8, 4), np.uint8)
    a[:, :, 1] = 200  # green everywhere, fully transparent
    out = image_scale(Image(a, ImageFormat.rgba_u8), (4, 4), "stb")
    assert int(out.data[2, 2, 3]) == 0  # still transparent
    assert int(out.data[2, 2, 1]) > 150, out.data[2, 2]  # color survived


def test_load_f32x4_rgb_u8_lane3():
    """Reference u8x3 load builds {r,g,b,1}/255 — lane 3 is 1/255, not 1
    (image-impl.h:22-26); f32x3 keeps lane 3 = 1.0."""
    from vision_tpu.image import Image, ImageFormat

    u8 = Image(np.zeros((1, 1, 3), np.uint8), ImageFormat.rgb_u8)
    assert abs(float(u8.load_f32x4()[0, 0, 3]) - 1.0 / 255.0) < 1e-7
    f32 = Image(np.zeros((1, 1, 3), np.float32), ImageFormat.rgb_f32)
    assert float(f32.load_f32x4()[0, 0, 3]) == 1.0


def test_stb_unchanged_axis_uses_mitchell():
    """stb v1 stbir__use_upsampling is ``ratio > 1``: an axis whose size is
    UNCHANGED takes the Mitchell downsample filter (softening a hard edge to
    ~14/241), not the identity Catmull-Rom (review r4c)."""
    from vision_tpu.image import Image, ImageFormat, image_scale

    a = np.zeros((4, 4, 1), np.uint8)
    a[:, 2:] = 255  # hard vertical 0|255 edge
    out = image_scale(Image(a, ImageFormat.alpha_u8), (4, 2), method="stb")
    # width unchanged: Mitchell taps [1/18, 16/18, 1/18] with clamped edges
    # -> [0, 255/18, 255*17/18, 255] = [0, 14, 241, 255]; the identity
    # Catmull-Rom would give [0, 0, 255, 255]
    col = out.data[0, :, 0].tolist()
    assert col == [0, 14, 241, 255], col


def test_stb_f32_transparent_pixels_lose_color():
    """stb v1 gates STBIR_ALPHA_EPSILON on non-float types: the f32 path
    premultiplies by raw alpha and unpremultiplies with alpha ? 1/alpha : 0,
    so a fully transparent region's color becomes 0 (review r4c); the u8
    path keeps color via the epsilon."""
    from vision_tpu.image import Image, ImageFormat, image_scale

    a = np.zeros((4, 4, 4), np.float32)
    a[:, :, 1] = 0.8  # green everywhere, alpha 0 everywhere
    out = image_scale(Image(a, ImageFormat.rgba_f32), (2, 2), method="stb")
    assert float(np.abs(out.data[:, :, 3]).max()) == 0.0
    assert float(np.abs(out.data[:, :, 1]).max()) == 0.0  # color zeroed

    o = np.zeros((4, 4, 4), np.float32)
    o[:, :, 1] = 0.8
    o[:, :, 3] = 1.0  # fully opaque: color must survive
    out_o = image_scale(Image(o, ImageFormat.rgba_f32), (2, 2), method="stb")
    np.testing.assert_allclose(out_o.data[:, :, 1], 0.8, rtol=1e-5)


def test_image_eq_is_identity():
    """The generated dataclass __eq__ would tuple-compare numpy arrays and
    raise; Image uses identity (compare pixels via image_difference_rms)."""
    from vision_tpu.image import Image, ImageFormat

    a = Image(np.zeros((2, 2, 3), np.uint8), ImageFormat.rgb_u8)
    b = Image(np.zeros((2, 2, 3), np.uint8), ImageFormat.rgb_u8)
    assert (a == b) is False and (a == a) is True
    assert a in [b, a]


def test_image_load_keeps_la_alpha(tmp_path):
    """Gray+alpha (PIL 'LA') files keep their alpha channel as rgba instead
    of silently flattening to opaque RGB (review r4c)."""
    from PIL import Image as PILImage

    from vision_tpu.image import ImageFormat, image_load

    la = PILImage.merge(
        "LA",
        [
            PILImage.fromarray(np.full((3, 3), 128, np.uint8)),
            PILImage.fromarray(np.array([[0, 128, 255]] * 3, np.uint8)),
        ],
    )
    la.save(tmp_path / "la.png")
    img = image_load(tmp_path / "la.png")
    assert img.format == ImageFormat.rgba_u8
    assert img.data[0, 0, 3] == 0 and img.data[0, 2, 3] == 255


def test_f32_to_u8_rejects_swizzled_formats():
    """bgra/argb destinations would be stored in RGBA lane order and lie
    about their format; reject like the reference's write-target assert."""
    from vision_tpu.core.errors import VispError
    from vision_tpu.image import Image, ImageFormat, image_f32_to_u8

    src = Image(np.zeros((2, 2, 4), np.float32), ImageFormat.rgba_f32)
    with pytest.raises(VispError, match="does not support"):
        image_f32_to_u8(src, ImageFormat.bgra_u8)


def test_u8_to_f32_accepts_rgb_constants():
    """Length-3 offset/scale (the shared IMAGENET constants) pad a neutral
    4th lane — identical to passing the explicit 4-tuples."""
    from vision_tpu.image import Image, ImageFormat, image_u8_to_f32

    rng = np.random.default_rng(3)
    src = Image(rng.integers(0, 256, (4, 5, 3), np.uint8), ImageFormat.rgb_u8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    a = image_u8_to_f32(
        src, ImageFormat.rgb_f32,
        offset=tuple(-m for m in mean), scale=tuple(1 / s for s in std),
    )
    b = image_u8_to_f32(
        src, ImageFormat.rgb_f32,
        offset=tuple(-m for m in mean) + (0.0,), scale=tuple(1 / s for s in std) + (1.0,),
    )
    np.testing.assert_array_equal(a.data, b.data)

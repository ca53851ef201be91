"""Video inference (vision_tpu/video.py): frame streams through the
batching servers, re-encoded at the source frame rate.

The servers' grouping/parity semantics are pinned by tests/test_serve.py;
these tests cover the video layer — reader/writer round-trip, per-family
output encoding (grayscale replication, detections), frame-order
preservation, the static-mask MI-GAN path, and the CLI's video-input
routing. No reference counterpart: the reference CLI is one image per
invocation (src/cli/cli.cpp). OpenCV-gated: the whole module skips when
cv2 is unavailable (video support is an optional dependency)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vision_tpu.core.device import backend_init
from vision_tpu.core.errors import VispError
from vision_tpu.image import Image, ImageFormat
from vision_tpu.video import VideoReader, VideoWriter, is_video, video_run


@pytest.fixture(scope="module")
def dev():
    return backend_init()


@pytest.fixture(scope="module")
def tiny_depthany(dev):
    from vision_tpu.models.depth_anything import DepthAnythingModel, DepthAnythingParams
    from vision_tpu.models.dino import DinoParams
    from vision_tpu.models.random_weights import random_depth_anything_params

    return DepthAnythingModel(
        random_depth_anything_params("test"),
        DepthAnythingParams(
            dino=DinoParams(embed_dim=64, n_heads=2, n_layers=4),
            image_size=126,
            feature_layers=(0, 1, 2, 3),
        ),
        dev,
    )


def _gradient_frames(n, h, w, seed=0):
    """Smooth frames (gradient + per-frame offset) so lossy codecs stay
    close to the source."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = ((yy * 255 // max(h - 1, 1) + xx * 255 // max(w - 1, 1)) // 2).astype(np.uint8)
    frames = []
    for i in range(n):
        # green = a flat per-frame level: identifies the frame through a
        # lossy codec (flat blocks survive compression almost exactly)
        green = np.full_like(base, min(20 + i * 30, 250))
        f = np.stack([base, green, base[::-1]], axis=2)
        r = np.clip(f[:, :, 0].astype(np.int32) + int(rng.integers(-8, 8)), 0, 255)
        f = f.copy()
        f[:, :, 0] = r.astype(np.uint8)
        frames.append(f)
    return frames


def _write_video(path, frames, fps=12.0):
    with VideoWriter(path, fps, (frames[0].shape[1], frames[0].shape[0])) as w:
        for f in frames:
            w.write(f)
    return str(path)


def test_is_video():
    assert is_video("clip.mp4") and is_video("A.AVI") and is_video("x.webm")
    assert not is_video("image.png") and not is_video("dir")


def test_reader_writer_roundtrip(tmp_path):
    frames = _gradient_frames(7, 48, 64)
    src = _write_video(tmp_path / "t.avi", frames, fps=12.0)
    with VideoReader(src) as r:
        assert r.extent == (64, 48)
        assert r.fps == pytest.approx(12.0, abs=0.5)
        got = list(r)
    assert len(got) == 7
    assert all(g.format == ImageFormat.rgb_u8 and g.extent == (64, 48) for g in got)
    # MJPG is lossy but close on smooth content
    err = np.mean(np.abs(got[0].data.astype(int) - frames[0].astype(int)))
    assert err < 8.0, err
    # frame ORDER survives: the flat green level identifies each frame
    for i in (0, 3, 6):
        level = float(np.mean(got[i].data[:, :, 1]))
        assert abs(level - (20 + i * 30)) < 12.0, (i, level)


def test_video_reader_errors(tmp_path):
    with pytest.raises(VispError, match="not a file"):
        VideoReader(tmp_path / "missing.mp4")
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"not a video")
    with pytest.raises(VispError, match="cannot open|no frames"):
        with VideoReader(bad) as r:
            if not list(r):  # some cv2 builds open the container, then EOF
                raise VispError("no frames")


def test_video_depthany_parity(tmp_path, tiny_depthany):
    """Frames stream through ImageServer in order; every output frame
    matches the direct compute path on the SAME decoded input frame
    (tolerance = output codec loss only)."""
    src = _write_video(tmp_path / "in.avi", _gradient_frames(5, 126, 140))
    out = tmp_path / "out.avi"
    logs = []
    dets = video_run(tiny_depthany, src, out, log=logs.append)
    assert dets is None
    with VideoReader(src) as r:
        inputs = list(r)
    with VideoReader(out) as r:
        assert r.extent == (140, 126)
        outputs = list(r)
    assert len(outputs) == 5
    for i in (0, 4):
        direct = tiny_depthany.compute(inputs[i])
        want = (np.clip(np.asarray(direct.data), 0.0, 1.0) * 255.0 + 0.5).astype(int)
        got = outputs[i].data[:, :, :1].astype(int)  # gray replicated to 3ch
        assert got.shape == want.shape
        assert np.mean(np.abs(got - want)) < 10.0
    assert any("frames in" in line for line in logs)


def test_video_yolo_detections(tmp_path, dev):
    from vision_tpu.models.random_weights import random_yolov9t_params
    from vision_tpu.models.yolov9t import Yolov9tModel, Yolov9tParams

    model = Yolov9tModel(random_yolov9t_params(), Yolov9tParams(input_size=160), dev)
    src = _write_video(tmp_path / "in.avi", _gradient_frames(4, 100, 120))
    out = tmp_path / "out.avi"
    dets = video_run(model, src, out, conf_thres=0.9, log=lambda *_: None)
    assert isinstance(dets, list) and len(dets) == 4  # one entry per frame
    for frame_dets in dets:
        for d in frame_dets:
            assert set(d) == {"class", "confidence", "box"} and len(d["box"]) == 4
    with VideoReader(out) as r:
        assert r.extent == (120, 100) and len(list(r)) == 4


def test_video_migan_static_mask(tmp_path, dev):
    from vision_tpu.image import image_save
    from vision_tpu.models.migan import MiganModel, MiganParams
    from vision_tpu.models.random_weights import random_migan_params

    model = MiganModel(random_migan_params(64), MiganParams(resolution=64), dev)
    src = _write_video(tmp_path / "in.avi", _gradient_frames(3, 64, 64))
    m = np.full((64, 64, 1), 255, np.uint8)
    m[20:40, 20:40] = 0  # hole to inpaint
    image_save(Image(m, ImageFormat.alpha_u8), tmp_path / "mask.png")
    out = tmp_path / "out.avi"
    video_run(model, src, out, mask=tmp_path / "mask.png", log=lambda *_: None)
    with VideoReader(src) as r:
        inputs = list(r)
    with VideoReader(out) as r:
        outputs = list(r)
    assert len(outputs) == 3
    # the keep region (mask=255) must be the ORIGINAL pixels, not the
    # generator's whole-frame reconstruction (composite in the drain path;
    # tolerance = two lossy encode round-trips)
    for i in (0, 2):
        keep_in = inputs[i].data[:10, :, :].astype(int)
        keep_out = outputs[i].data[:10, :, :].astype(int)
        assert np.mean(np.abs(keep_out - keep_in)) < 12.0
    with pytest.raises(VispError, match="needs a mask"):
        video_run(model, src, tmp_path / "o2.avi", log=lambda *_: None)


def test_video_run_validation(tmp_path, tiny_depthany):
    src = _write_video(tmp_path / "in.avi", _gradient_frames(2, 126, 140))
    with pytest.raises(VispError, match="must be a video file"):
        video_run(tiny_depthany, src, tmp_path / "out.png")
    with pytest.raises(VispError, match="overwrite its input"):
        video_run(tiny_depthany, src, src)
    with pytest.raises(VispError, match="unsupported model type"):
        video_run(object(), src, tmp_path / "out.avi")


def test_video_cli_rejects_single_image_options(tmp_path, capsys):
    """--tile/--composite belong to the single-image paths; video mode
    rejects them up front instead of silently ignoring them (an HD esrgan
    clip would otherwise fail on frame 1 pointing at a path video mode
    doesn't expose)."""
    from vision_tpu.cli import main

    src = _write_video(tmp_path / "in.avi", _gradient_frames(1, 32, 32))
    rc = main(["esrgan", "-i", src, "-o", str(tmp_path / "o.avi"), "--tile", "256"])
    assert rc == 1 and "not supported in video mode" in capsys.readouterr().err
    rc = main(["sam", "-i", src, "-o", str(tmp_path / "o.avi"),
               "--composite", str(tmp_path / "c.png")])
    assert rc == 1 and "not supported in video mode" in capsys.readouterr().err


def test_video_cli_depthany(tmp_path):
    """Video -i routes the CLI into video mode end-to-end."""
    import torch
    from test_depth_anything import TDepthAnything
    from workbench import randomize

    from vision_tpu.cli import main
    from vision_tpu.convert.convert import convert_model

    t = randomize(TDepthAnything())
    torch.save(t.state_dict(), tmp_path / "d.pth")
    model = convert_model("depth-anything", tmp_path / "d.pth", tmp_path / "d.gguf")
    src = _write_video(tmp_path / "in.avi", _gradient_frames(3, 70, 70))
    out = tmp_path / "out.avi"
    rc = main(["depthany", "-m", str(model), "-i", src, "-o", str(out), "-b", "cpu"])
    assert rc == 0
    with VideoReader(out) as r:
        assert r.extent == (70, 70) and len(list(r)) == 3

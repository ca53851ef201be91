"""CLI smoke tests across verbs (reference A5/A6). Each test builds a GGUF
via the converter or writer, saves a PNG input, and drives `vision-cli`."""

import numpy as np
import pytest
import torch

from vision_tpu.cli import main
from vision_tpu.core.gguf import GGUFWriter
from vision_tpu.image import image_load, image_load_array, image_save

from workbench import randomize


def _save_img(tmp_path, name, shape, seed=0):
    img = image_load_array(np.random.default_rng(seed).integers(0, 256, shape).astype(np.uint8))
    p = tmp_path / name
    image_save(img, p)
    return str(p)


def _gguf_from_dict(path, arch, params, meta=None):
    w = GGUFWriter(path, arch)
    w.add(f"{arch}.tensor_data_layout", "whcn")
    for k, v in (meta or {}).items():
        w.add(k, v)
    for k, v in params.items():
        w.add_tensor(k, v)
    w.write()
    return str(path)


def test_cli_compare(tmp_path, capsys):
    a = _save_img(tmp_path, "a.png", (32, 40, 3), seed=1)
    b = _save_img(tmp_path, "b.png", (32, 40, 3), seed=2)
    assert main(["compare", "-i", a, a]) == 0
    out = capsys.readouterr().out
    assert "rms  0.000000" in out and "ssim 1.00000" in out and "psnr inf" in out
    # different images + a gating threshold -> exit 2
    assert main(["compare", "-i", a, b, "--max-rms", "0.0001"]) == 2
    out = capsys.readouterr().out
    assert "rms" in out and "psnr" in out


def test_cli_migan(tmp_path):
    from test_migan import TMigan
    from vision_tpu.convert.convert import convert_model

    t = randomize(TMigan())
    ckpt = tmp_path / "m.pth"
    torch.save(t.state_dict(), ckpt)
    model = convert_model("migan", ckpt, tmp_path / "m.gguf")
    img = _save_img(tmp_path, "in.png", (16, 16, 3))
    mask = _save_img(tmp_path, "mask.png", (16, 16, 1), seed=1)
    out = tmp_path / "out.png"
    rc = main(["migan", "-m", str(model), "-i", img, mask, "-o", str(out), "-b", "cpu"])
    assert rc == 0
    assert image_load(out).extent == (16, 16)


def test_cli_depthany(tmp_path):
    from test_depth_anything import TDepthAnything
    from vision_tpu.convert.convert import convert_model

    t = randomize(TDepthAnything())
    ckpt = tmp_path / "d.pth"
    torch.save(t.state_dict(), ckpt)
    model = convert_model("depth-anything", ckpt, tmp_path / "d.gguf")
    img = _save_img(tmp_path, "in.png", (60, 80, 3))
    out = tmp_path / "depth.png"
    rc = main(["depthany", "-m", str(model), "-i", img, "-o", str(out), "-b", "cpu"])
    assert rc == 0
    assert image_load(out).extent == (80, 60)


def test_cli_export(tmp_path):
    """export verb: GGUF in, loadable StableHLO bundle out."""
    from test_depth_anything import TDepthAnything
    from vision_tpu.convert.convert import convert_model
    from vision_tpu.export import load_bundle

    t = randomize(TDepthAnything())
    ckpt = tmp_path / "d.pth"
    torch.save(t.state_dict(), ckpt)
    model = convert_model("depth-anything", ckpt, tmp_path / "d.gguf")
    dst = tmp_path / "d.vxp"
    rc = main(["export", "-m", str(model), "-o", str(dst), "-b", "cpu",
               "--extent", "70", "70"])
    assert rc == 0
    b = load_bundle(dst)
    assert b.names == ["forward"]
    assert b.meta["family"] == "DepthAnythingModel"
    w, h = b.meta["extent"]
    x = np.random.default_rng(0).integers(0, 255, (1, h, w, 3), np.uint8)
    y = np.asarray(b.call("forward", x))
    assert y.shape[:3] == (1, h, w)


@pytest.mark.slow
def test_cli_yolov9t(tmp_path):
    """Full-size YOLOv9t weights through the CLI (including --dump)."""
    from vision_tpu.models.random_weights import random_yolov9t_params

    model = _gguf_from_dict(tmp_path / "y.gguf", "yolov9t", random_yolov9t_params())
    img = _save_img(tmp_path, "in.png", (120, 160, 3))
    out = tmp_path / "boxes.png"
    dump = tmp_path / "dump"
    rc = main([
        "yolov9t", "-m", str(model), "-i", img, "-o", str(out), "-b", "cpu",
        "--conf", "0.99", "--dump", str(dump),
    ])
    assert rc == 0
    assert image_load(out).extent == (160, 120)
    assert len(list(dump.glob("*.npy"))) >= 22


def test_cli_serve_multi_model_routing(tmp_path, monkeypatch):
    """serve loads -m plus every --extra-model (family auto-detected) and
    hands them to serve_forever; duplicate families error."""
    from test_esrgan import RRDBNet, _write_gguf
    from vision_tpu.models.random_weights import random_yolov9t_params

    esr = _write_gguf(tmp_path / "esrgan.gguf", randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4)), 4, 1)
    yolo = _gguf_from_dict(tmp_path / "y.gguf", "yolov9t", random_yolov9t_params())

    captured = {}

    def fake_serve_forever(**kw):
        captured.update(kw)

    import vision_tpu.serve_http as sh

    monkeypatch.setattr(sh, "serve_forever", fake_serve_forever)
    rc = main(["serve", "-m", str(esr), "--extra-model", str(yolo), "-b", "cpu",
               "--port", "0", "--batch", "2"])
    assert rc == 0
    assert captured["esrgan_model"] is not None
    assert captured["yolo_model"] is not None
    assert captured["batch_size"] == 2

    rc = main(["serve", "-m", str(esr), "--extra-model", str(esr), "-b", "cpu"])
    assert rc != 0  # duplicate family


def test_cli_serve_dp_mesh(tmp_path, monkeypatch):
    """serve --dp N loads mesh-capable models sharded (data parallel over
    N chips); --batch must divide by --dp; non-sharding families still load."""
    from test_esrgan import RRDBNet, _write_gguf

    esr = _write_gguf(tmp_path / "esrgan.gguf", randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4)), 4, 1)

    captured = {}

    def fake_serve_forever(**kw):
        captured.update(kw)

    import vision_tpu.serve_http as sh

    monkeypatch.setattr(sh, "serve_forever", fake_serve_forever)
    from vision_tpu.models.random_weights import random_yolov9t_params

    yolo = _gguf_from_dict(tmp_path / "y.gguf", "yolov9t", random_yolov9t_params())
    rc = main(["serve", "-m", str(esr), "--extra-model", str(yolo), "-b", "cpu",
               "--dp", "2", "--batch", "2"])
    assert rc == 0
    model = captured["esrgan_model"]
    assert model.mesh is not None and model.mesh.shape["dp"] == 2
    # EVERY served family gets the mesh (review r4c: only sam/esrgan did)
    assert captured["yolo_model"].mesh is not None
    assert captured["yolo_model"].mesh.shape["dp"] == 2

    rc = main(["serve", "-m", str(esr), "-b", "cpu", "--dp", "2", "--batch", "3"])
    assert rc != 0  # batch not divisible by dp

    # no --batch: defaults pass through as None so each service resolves its
    # own per-chip optimum * dp (a fixed default of 4 used to FAIL the
    # divisibility check for --dp 8 and override SamServer's measured b6)
    captured.clear()
    rc = main(["serve", "-m", str(esr), "-b", "cpu", "--dp", "2"])
    assert rc == 0
    assert captured["batch_size"] is None

    # --extra-model typos fail in the cheap pre-device validation
    rc = main(["serve", "-m", str(esr), "--extra-model", "nope.gguf", "-b", "cpu"])
    assert rc != 0


def test_cli_fails_fast_and_validates_prompt(tmp_path, capsys):
    """Cheap argument validation runs BEFORE device init / weight loading
    (reference parity: 'Expected 2 (point) or 4 (box) numbers')."""
    from test_esrgan import RRDBNet, _write_gguf

    # missing model: clean error, exit 1, no traceback
    rc = main(["sam", "-m", "nope.gguf", "-i", "x.jpg", "-b", "cpu"])
    assert rc != 0
    assert "Model file not found" in capsys.readouterr().err

    esr = _write_gguf(tmp_path / "esr.gguf", randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4)), 4, 1)
    # missing input file: clean error before any model load
    rc = main(["esrgan", "-m", str(esr), "-i", str(tmp_path / "missing.png"), "-b", "cpu"])
    assert rc != 0
    assert "Input file not found" in capsys.readouterr().err

    # bad prompt arity (reference cli.cpp:368 semantics)
    img = tmp_path / "img.png"
    from vision_tpu.image import Image, ImageFormat, image_save

    image_save(Image(np.zeros((16, 16, 3), np.uint8), ImageFormat.rgb_u8), img)
    rc = main(["sam", "-m", str(esr), "-i", str(img), "-p", "500", "-b", "cpu"])
    assert rc != 0
    assert "Expected 2 (point) or 4 (box)" in capsys.readouterr().err

    # exact input arity (reference require_inputs, cli.cpp:104-108): extra
    # inputs error rather than being silently ignored; migan needs exactly 2
    rc = main(["esrgan", "-m", str(esr), "-i", str(img), str(img), "-b", "cpu"])
    assert rc != 0
    assert "Expected -i to be followed by 1" in capsys.readouterr().err
    rc = main(["migan", "-m", str(esr), "-i", str(img), "-b", "cpu"])
    assert rc != 0
    assert "Expected -i to be followed by 2" in capsys.readouterr().err


def test_cli_profile_writes_trace(tmp_path):
    """--profile DIR captures a jax.profiler trace of the inference phase
    (SURVEY §5 tracing; viewable in TensorBoard/Perfetto)."""
    from test_esrgan import RRDBNet, _write_gguf

    esr = _write_gguf(tmp_path / "esr.gguf", randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4)), 4, 1)
    img = _save_img(tmp_path, "in.png", (16, 16, 3))
    prof = tmp_path / "prof"
    rc = main(["esrgan", "-m", str(esr), "-i", img, "-o", str(tmp_path / "o.png"),
               "-b", "cpu", "--profile", str(prof)])
    assert rc == 0
    assert list(prof.rglob("*.trace.json.gz")), "no trace file written"


def test_cli_info(tmp_path, capsys):
    """info prints metadata, family, and a per-type tensor breakdown without
    touching a device; --tensors adds the full table; unknown arch reports
    family 'unknown' instead of erroring."""
    from test_esrgan import RRDBNet, _write_gguf

    esr = _write_gguf(tmp_path / "esr.gguf", randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4)), 4, 1)
    rc = main(["info", "-m", str(esr)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "architecture: esrgan  family: esrgan" in out
    assert "esrgan.tensor_data_layout" in out
    assert "F32" in out and "tensors" in out

    rc = main(["info", "-m", str(esr), "--tensors"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "model.0.weight" in out  # per-tensor table present

    # unknown architecture: still inspectable, family reported unknown
    alien = _gguf_from_dict(tmp_path / "alien.gguf", "alien",
                            {"w": np.zeros((4, 4), np.float32)})
    rc = main(["info", "-m", str(alien)])
    assert rc == 0
    assert "family: unknown" in capsys.readouterr().out

    rc = main(["info", "-m", "nope.gguf"])
    assert rc != 0
    assert "not found" in capsys.readouterr().err


def test_cli_quantize_explicit_output_honored(tmp_path, capsys):
    """-o given to quantize is used verbatim (a default-sentinel collision
    used to silently redirect 'output.png' to a derived name)."""
    from test_esrgan import RRDBNet, _write_gguf

    esr = _write_gguf(tmp_path / "esr.gguf", randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4)), 4, 1)
    out = tmp_path / "output.png"  # deliberately the old sentinel value
    rc = main(["quantize", "-m", str(esr), "-o", str(out), "--type", "f16"])
    assert rc == 0
    assert out.exists()

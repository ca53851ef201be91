"""Capture / dump / profiling utility tests (SURVEY.md §5 aux subsystems)."""

import numpy as np
import pytest

from vision_tpu.ops.debug import capture, capture_context, capturing
from vision_tpu.utils import Timer, compare_dumps, dump_captures


def test_capture_context_records_only_inside():
    assert not capturing()
    capture("outside", 1)  # no-op
    with capture_context() as caps:
        assert capturing()
        capture("a", np.ones(3))
        capture("b", 42)
    assert set(caps) == {"a", "b"}
    assert not capturing()


def test_capture_through_model():
    """dino_get_intermediate_layers tags outputs via capture()."""
    import torch

    from test_depth_anything import TDino
    from vision_tpu.models.dino import DinoParams, dino_get_intermediate_layers
    from workbench import input_tensor, make_params, randomize, to_nhwc

    t = randomize(TDino(dim=32, heads=4, layers=2, patch=14, grid=4))
    x = input_tensor(1, 3, 56, 56)
    with capture_context() as caps:
        dino_get_intermediate_layers(
            make_params(t), to_nhwc(x), [1], DinoParams(14, 32, 4, 2)
        )
    assert "dino_layer_1" in caps


def test_dump_and_compare(tmp_path):
    a = {"layer.0": np.ones((2, 3)), "layer.1": np.zeros(4)}
    b = {"layer.0": np.ones((2, 3)), "layer.1": np.full(4, 0.5)}
    dump_captures(a, tmp_path / "a")
    dump_captures(b, tmp_path / "b")
    report = compare_dumps(tmp_path / "a", tmp_path / "b")
    assert report["layer_0.npy"]["status"] == "ok"
    assert report["layer_1.npy"]["status"] == "mismatch"
    assert report["layer_1.npy"]["max_abs"] == pytest.approx(0.5)


def test_dump_name_collisions_disambiguated(tmp_path):
    """Distinct capture names that sanitize to the same filename must not
    silently overwrite each other (review r4c), and bf16 device arrays
    dump via an on-device f32 cast."""
    import jax.numpy as jnp

    caps = {
        "a.b": np.full((2,), 1.0, np.float32),
        "a_b": np.full((2,), 2.0, np.float32),
        "a/b": np.full((2,), 3.0, np.float32),
        "bf": jnp.asarray([1.5, 2.5], jnp.bfloat16),
    }
    written = dump_captures(caps, tmp_path / "d")
    assert len(written) == len(set(written)) == 4
    vals = sorted(float(np.load(p)[0]) for p in written)
    assert vals == [1.0, 1.5, 2.0, 3.0]
    assert np.load([p for p in written if "bf" in p][0]).dtype == np.float32


def test_timer():
    with Timer("x", verbose=False) as t:
        sum(range(1000))
    assert t.elapsed > 0
    assert "ms" in t.elapsed_str()


def test_yolo_backbone_captures():
    """All 22 layer outputs are capturable (reference --dump-keys)."""
    from test_yolov9t import TYolo
    from vision_tpu.models.yolov9t import Yolov9tParams, yolov9t_forward
    from workbench import input_tensor, make_params, randomize, to_nhwc

    t = randomize(TYolo())
    x = input_tensor(1, 3, 64, 64)
    with capture_context() as caps:
        yolov9t_forward(make_params(t), to_nhwc(x), Yolov9tParams(num_classes=4), n_csp=1)
    assert {f"model.{i}" for i in range(22)} <= set(caps)

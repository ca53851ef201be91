"""AOT export bundles (vision_tpu/export.py): StableHLO serialization of
the model programs, self-contained (weights-embedded) and program-only
forms, loaded back and asserted against the live jitted executables.
The program-only form is bit-exact (same HLO, same backend => identical
bits); the embedded form turns weights into StableHLO constants, which
lets XLA constant-fold weight-dependent subgraphs into different
(equally valid) op orderings — those cases assert a tight float
tolerance instead of bits.

The reference's deployment artifact stops at the GGUF weight file; these
bundles are the TPU-side extension (a compiled-program artifact), so the
oracles here are the in-process model programs themselves.
"""

import json
import zipfile

import numpy as np
import pytest

import jax.numpy as jnp

from vision_tpu.core.device import backend_init
from vision_tpu.export import export_bundle, export_model, load_bundle


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


def test_export_roundtrip_embedded(tmp_path, tiny_depthany):
    """Self-contained bundle: one file, loader needs no params — output
    matches the live program at the same geometry (float-rounding-level
    tolerance: embedded weights constant-fold, see module docstring)."""
    da = tiny_depthany
    dst = tmp_path / "da.vxp"
    names = export_model(da, dst, extent=(126, 126), batch=2)
    assert names == ["forward"]
    x = np.random.default_rng(0).integers(0, 255, (2, 126, 126, 3), np.uint8)
    want = np.asarray(da._fn((126, 126))(da.params, jnp.asarray(x)))

    b = load_bundle(dst)
    assert b.meta["family"] == "DepthAnythingModel"
    assert b.meta["params_embedded"] is True
    got = np.asarray(b.call("forward", x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # recorded input spec matches what we passed
    (spec,) = b.input_specs("forward")
    assert spec == [[2, 126, 126, 3], "uint8"]


def test_export_roundtrip_program_only(tmp_path, tiny_depthany):
    """embed_params=False: the artifact carries the program only and call
    takes the param dict first — and it is MUCH smaller than the
    embedded form."""
    da = tiny_depthany
    small, big = tmp_path / "prog.vxp", tmp_path / "full.vxp"
    export_model(da, small, extent=(126, 126), embed_params=False)
    export_model(da, big, extent=(126, 126))
    assert small.stat().st_size < big.stat().st_size / 2
    x = np.random.default_rng(1).integers(0, 255, (1, 126, 126, 3), np.uint8)
    want = np.asarray(da._fn((126, 126))(da.params, jnp.asarray(x)))
    got = np.asarray(load_bundle(small).call("forward", da.params, x))
    assert np.array_equal(got, want)


def test_export_migan_two_inputs(tmp_path, dev):
    from vision_tpu.models.migan import MiganModel, MiganParams
    from vision_tpu.models.random_weights import random_migan_params

    mg = MiganModel(random_migan_params(64), MiganParams(resolution=64), dev)
    dst = tmp_path / "mg.vxp"
    assert export_model(mg, dst) == ["forward"]
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (1, 64, 64, 3), np.uint8)
    mask = rng.integers(0, 255, (1, 64, 64, 1), np.uint8)
    want = np.asarray(mg._run(mg.params, jnp.asarray(img), jnp.asarray(mask)))
    got = np.asarray(load_bundle(dst).call("forward", img, mask))
    assert np.array_equal(got, want)


def test_export_bundle_container_and_errors(tmp_path, tiny_depthany):
    dst = tmp_path / "da.vxp"
    export_model(tiny_depthany, dst, extent=(126, 126))
    # container anatomy: meta.json + one .stablehlo per entry
    with zipfile.ZipFile(dst) as z:
        names = set(z.namelist())
        assert "meta.json" in names and "forward.stablehlo" in names
        meta = json.loads(z.read("meta.json"))
        assert meta["format"] == "vision_tpu-export-v1"
        assert "jax_version" in meta
    b = load_bundle(dst)
    with pytest.raises(Exception, match="no entry 'decode'"):
        b.call("decode", np.zeros((1,), np.uint8))
    # a non-bundle zip is rejected with a clear message
    bad = tmp_path / "bad.vxp"
    with zipfile.ZipFile(bad, "w") as z:
        z.writestr("something.txt", "hi")
    with pytest.raises(Exception, match="no meta.json"):
        load_bundle(bad)
    with pytest.raises(Exception, match="batch must be >= 1"):
        export_model(tiny_depthany, tmp_path / "x.vxp", batch=0)


def test_export_bundle_lowlevel(tmp_path):
    """export_bundle is usable directly for arbitrary jitted functions."""
    import jax

    f = jax.jit(lambda a, b: jnp.tanh(a) @ b)
    spec = jax.ShapeDtypeStruct((4, 8), jnp.float32)
    spec2 = jax.ShapeDtypeStruct((8, 2), jnp.float32)
    dst = tmp_path / "fn.vxp"
    export_bundle(dst, {"f": (f, (spec, spec2))}, meta={"note": "test"})
    b = load_bundle(dst)
    assert b.meta["note"] == "test"
    rng = np.random.default_rng(3)
    a = rng.standard_normal((4, 8)).astype(np.float32)
    c = rng.standard_normal((8, 2)).astype(np.float32)
    assert np.array_equal(np.asarray(b.call("f", a, c)), np.asarray(f(a, c)))


def test_export_refuses_meshed_models(tmp_path, dev):
    from vision_tpu.models.migan import MiganModel, MiganParams
    from vision_tpu.models.random_weights import random_migan_params

    class FakeMesh:  # export must refuse before touching the mesh
        pass

    mg = MiganModel(random_migan_params(64), MiganParams(resolution=64), dev)
    mg.mesh = FakeMesh()
    with pytest.raises(Exception, match="sharded models don't export"):
        export_model(mg, tmp_path / "x.vxp")

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


def test_export_yolo_namedtuple_outputs_become_dicts(tmp_path, dev):
    """Programs returning NamedTuple pytrees (DetectOutput) must export:
    jax.export can't serialize unregistered NamedTuples, so export_model
    rewrites outputs to plain {field: array} dicts — loadable with jax
    alone (review r4i finding: sam/yolo/sam3 export crashed)."""
    from vision_tpu.models.random_weights import random_yolov9t_params
    from vision_tpu.models.yolov9t import Yolov9tModel, Yolov9tParams

    model = Yolov9tModel(random_yolov9t_params(), Yolov9tParams(input_size=160), dev)
    dst = tmp_path / "y.vxp"
    assert export_model(model, dst) == ["forward"]
    x = np.random.default_rng(4).integers(0, 255, (1, 160, 160, 3), np.uint8)
    got = load_bundle(dst).call("forward", x)
    want = model._run(model.params, jnp.asarray(x))
    assert isinstance(got, dict) and set(got) == set(want._fields)
    for field in want._fields:
        np.testing.assert_allclose(
            np.asarray(got[field]), np.asarray(getattr(want, field)),
            rtol=1e-4, atol=1e-5,
        )


def test_export_sam_three_entries_serialize(tmp_path, dev):
    """SAM exports encode + both decode entries (SamPrediction outputs);
    serialization alone exercises the NamedTuple rewrite — a .call would
    recompile the full 1024 encoder, already covered by test_serve."""
    from vision_tpu.models.mobile_sam import SamModel, SamParams
    from vision_tpu.models.random_weights import random_mobile_sam_params

    model = SamModel(
        {k: np.asarray(v) for k, v in random_mobile_sam_params(0).items()},
        SamParams(), dev,
    )
    dst = tmp_path / "s.vxp"
    names = export_model(model, dst, batch=2)
    assert names == ["decode_box", "decode_point", "encode"]
    b = load_bundle(dst)
    (enc_spec,) = b.input_specs("encode")
    assert enc_spec == [[2, 1024, 1024, 3], "uint8"]
    # decode entries are per-prompt: coords (2, 2) f32 rides last
    assert b.input_specs("decode_point")[-1] == [[2, 2], "float32"]


def test_export_sam3_vision_and_text(tmp_path, dev):
    """SAM3 exports encode_vision (batch-general) + encode_text
    (per-prompt); the vision program already returns a plain tuple of FPN
    levels (sam3.py _sam3_programs) and the loaded copy matches it."""
    import json as _json

    import torch
    from test_sam3 import TClipText, TFpnLayer, TVit
    from workbench import randomize

    from vision_tpu.convert.convert import convert_model
    from vision_tpu.models.sam3 import Sam3Model, Sam3VitParams, sam3_load_model

    tokens = ["<unk>", "a", "b", "a</w>", "b</w>", "<|startoftext|>", "<|endoftext|>"]
    (tmp_path / "vocab.json").write_text(_json.dumps({t: i for i, t in enumerate(tokens)}))
    (tmp_path / "merges.txt").write_text("#version\na b\n")
    (tmp_path / "tokenizer_config.json").write_text(_json.dumps({
        "bos_token_id": 5, "eos_token_id": 6, "pad_token_id": 6,
        "unk_token_id": 0, "model_max_length": 8,
    }))
    dim, fpn = 8, 4
    text = randomize(TClipText(vocab=7, dim=16, heads=4, layers=2, max_pos=8))
    vit = randomize(TVit(dim=dim, heads=2, layers=3, patch=4, pretrain_grid=4,
                         window=2, glob=(1,), img=16), seed=5)
    neck = [randomize(TFpnLayer(dim, fpn, i), seed=20 + i) for i in range(4)]
    ckpt = {}
    for k, v in text.state_dict().items():
        ckpt["detector_model.text_encoder.text_model." + k] = v
    for k, v in vit.state_dict().items():
        ckpt["detector_model.vision_encoder.backbone." + k] = v
    for i, lay in enumerate(neck):
        for k, v in lay.state_dict().items():
            ckpt[f"detector_model.vision_encoder.neck.fpn_layers.{i}." + k] = v
    torch.save(ckpt, tmp_path / "sam3.pth")
    gguf = convert_model("sam3", tmp_path / "sam3.pth", tmp_path / "sam3.gguf")

    vp = Sam3VitParams(image_size=16, patch_size=4, window_size=2, n_layers=3,
                       n_heads=2, global_attn_indexes=(1,))
    loaded = sam3_load_model(str(gguf), dev)
    model = Sam3Model(loaded.params, loaded.tokenizer, loaded.max_tokens, dev, vp=vp)

    dst = tmp_path / "s3.vxp"
    names = export_model(model, dst, batch=2)
    assert names == ["encode_text", "encode_vision"]
    b = load_bundle(dst)
    assert b.input_specs("encode_vision")[-1][0] == [2, 16, 16, 3]
    x = np.random.default_rng(6).standard_normal((2, 16, 16, 3)).astype(np.float32)
    got = b.call("encode_vision", x)
    want = model._vision_fn(model.params, model._vision_stack(), jnp.asarray(x))
    assert isinstance(got, tuple) and len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-5)


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


def test_export_refuses_meshed_non_sam_models(tmp_path, dev):
    from vision_tpu.models.migan import MiganParams, MiganModel
    from vision_tpu.models.random_weights import random_migan_params

    class FakeMesh:  # export must refuse before touching the mesh
        pass

    mg = MiganModel(random_migan_params(64), MiganParams(resolution=64), dev)
    mg.mesh = FakeMesh()
    with pytest.raises(Exception, match="meshed MiganModel doesn't export"):
        export_model(mg, tmp_path / "x.vxp")


@pytest.mark.heavy
def test_export_meshed_sam_roundtrip(tmp_path):
    """dp-sharded SAM export (the serving deployment case, VERDICT r4 next
    #5): a mesh-constructed SamModel exports its dp-sharded encode; the
    loaded bundle rebuilds the mesh from local devices (call_sharded),
    places the GGUF-shaped param dict, and matches the live meshed model.
    Decode entries ride along as single-device per-prompt programs."""
    from vision_tpu.core.device import BackendType, backend_init
    from vision_tpu.image import image_load_array
    from vision_tpu.models.mobile_sam import SamModel, SamParams, TinyVitLayer, TinyVitParams
    from vision_tpu.models.random_weights import random_mobile_sam_params
    from vision_tpu.parallel import make_mesh

    tp512 = TinyVitParams(
        img_size=512,
        layers=(
            TinyVitLayer(128, 64, 2, 2, 7, True),
            TinyVitLayer(64, 128, 2, 4, 7, True),
            TinyVitLayer(32, 160, 6, 5, 14, True),
            TinyVitLayer(32, 320, 2, 10, 7, False),
        ),
    )
    dev = backend_init(BackendType.cpu)
    params = random_mobile_sam_params(seed=0)
    mesh = make_mesh(2)
    model = SamModel(params, SamParams(image_size=512), dev, mesh=mesh, tiny_vit=tp512)

    with pytest.raises(Exception, match="embed_params=False"):
        export_model(model, tmp_path / "bad.vxp")
    dst = tmp_path / "sam_dp2.vxp"
    # encode only: the decode programs need the production 64x64 embedding
    # (the dense positional-encoding WEIGHT fixes the token grid), so the
    # reduced 512 test geometry can't lower them — entries= selects the
    # subset, the same knob a deployment uses for an encoder-only bundle
    names = export_model(model, dst, batch=2, embed_params=False, entries=("encode",))
    assert names == ["encode"]

    b = load_bundle(dst)
    assert b.meta["mesh"]["dp"] == 2  # size-1 axes ride along for shard_params
    assert b.meta["entries"]["encode"]["nr_devices"] == 2

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (512, 512, 3)).astype(np.uint8) for _ in range(2)]
    want = np.asarray(model.encode_batch([image_load_array(f) for f in frames]))
    got = np.asarray(b.call_sharded("encode", params, np.stack(frames)))
    np.testing.assert_allclose(got, want, atol=2e-5)

    with pytest.raises(Exception, match="unknown entries"):
        export_model(model, tmp_path / "y.vxp", batch=2, embed_params=False,
                     entries=("nope",))

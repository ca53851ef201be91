"""LoRA adapter tests (vision_tpu/lora.py + the ops.nn.linear hook).

The reference is inference-only; LoRA is part of the training north-star
extra. Pinned here: init-identity (B=0 -> bit-identical forward), the
adapter math at the linear op, merge/strip parity, adapter-only training
(base weights bit-frozen), the GGUF adapter-file roundtrip with its
validation errors, and a real-model path (tiny Depth-Anything twin:
attention-targeted adapters leave prediction unchanged at init).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from vision_tpu.core.errors import VispError
from vision_tpu.core.params import Params
from vision_tpu.lora import (
    LORA_TRAINABLE,
    add_lora,
    load_lora,
    lora_modules,
    merge_lora,
    save_lora,
    strip_lora,
)
from vision_tpu.ops.nn import linear
from vision_tpu.train import create_train_state, make_train_step


def _base(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "enc.fc1.weight": (rng.normal(size=(24, 16)) * 0.2).astype(np.float32),
        "enc.fc1.bias": (rng.normal(size=(24,)) * 0.1).astype(np.float32),
        "enc.fc2.weight": (rng.normal(size=(8, 24)) * 0.2).astype(np.float32),
        "enc.norm.weight": np.ones(16, np.float32),  # 1-D: never adapted
        "enc.conv.weight": rng.normal(size=(4, 3, 3, 3)).astype(np.float32),  # 4-D
        "buf.idx": np.arange(3, dtype=np.int32),
    }


def _forward(store, x):
    p = Params(store)
    h = jax.nn.relu(linear(p["enc"]["fc1"], x))
    return linear(p["enc"]["fc2"], h)


def test_add_lora_init_identity():
    base = _base()
    x = np.random.default_rng(1).normal(size=(5, 16)).astype(np.float32)
    y0 = np.asarray(_forward(base, x))
    adapted = add_lora(base, rank=4)
    assert lora_modules(adapted) == ["enc.fc1", "enc.fc2"]
    assert adapted["enc.fc1.lora_a"].shape == (4, 16)
    assert adapted["enc.fc1.lora_b"].shape == (24, 4)
    assert adapted["enc.fc2.lora_a"].shape == (4, 24)
    # B starts at zero: forward is bit-identical until training moves it
    np.testing.assert_array_equal(np.asarray(_forward(adapted, x)), y0)
    # base dict was not mutated
    assert "enc.fc1.lora_a" not in base


def test_add_lora_targets_and_errors():
    base = _base()
    only = add_lora(base, rank=2, targets=r"fc1")
    assert lora_modules(only) == ["enc.fc1"]
    with pytest.raises(VispError):  # explicit target that is a conv
        add_lora(base, targets=r"enc\.conv")
    with pytest.raises(VispError):  # matches nothing
        add_lora(base, targets=r"nonexistent")
    with pytest.raises(VispError):
        add_lora(base, rank=0)
    with pytest.raises(VispError):  # everything already adapted
        add_lora(add_lora(base, rank=2), rank=2)


def test_linear_adapter_math():
    rng = np.random.default_rng(2)
    store = {
        "m.weight": rng.normal(size=(6, 10)).astype(np.float32),
        "m.bias": rng.normal(size=(6,)).astype(np.float32),
        "m.lora_a": rng.normal(size=(3, 10)).astype(np.float32),
        "m.lora_b": rng.normal(size=(6, 3)).astype(np.float32),
    }
    x = rng.normal(size=(7, 10)).astype(np.float32)
    got = np.asarray(linear(Params(store)["m"], x))
    want = (
        x @ store["m.weight"].T
        + (x @ store["m.lora_a"].T) @ store["m.lora_b"].T
        + store["m.bias"]
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_conv1x1_adapter():
    """1x1 conv weights take adapters (VERDICT r4 next #4: conv-LoRA —
    they are matmuls): init-identity, math parity against the explicit
    low-rank delta, stride/pad alignment of the adapter path, and merge
    parity back into the (O, I, 1, 1) base."""
    from vision_tpu.ops.nn import conv_2d

    rng = np.random.default_rng(5)
    base = {
        "head.cv.weight": (rng.normal(size=(12, 8, 1, 1)) * 0.2).astype(np.float32),
        "head.cv.bias": (rng.normal(size=(12,)) * 0.1).astype(np.float32),
    }
    x = rng.normal(size=(2, 9, 7, 8)).astype(np.float32)

    def fwd(store, stride=1, pad=0):
        return np.asarray(conv_2d(Params(store)["head"]["cv"], jnp.asarray(x), stride, pad))

    y0 = fwd(base)
    adapted = add_lora(base, rank=3, seed=2)
    assert lora_modules(adapted) == ["head.cv"]
    assert adapted["head.cv.lora_a"].shape == (3, 8)
    assert adapted["head.cv.lora_b"].shape == (12, 3)
    np.testing.assert_array_equal(fwd(adapted), y0)  # B=0: bit-identical

    for k in ("head.cv.lora_a", "head.cv.lora_b"):
        adapted[k] = (rng.normal(size=adapted[k].shape) * 0.1).astype(np.float32)
    got = fwd(adapted)
    delta = adapted["head.cv.lora_b"] @ adapted["head.cv.lora_a"]  # (O, I)
    want = y0 + np.einsum("bhwi,oi->bhwo", x, delta)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    # the adapter path carries the base conv's stride/pad, and merging
    # folds the delta into the 4-D kernel exactly
    y_sp = fwd(adapted, stride=2, pad=1)
    merged = merge_lora(adapted)
    assert lora_modules(merged) == []
    assert merged["head.cv.weight"].shape == (12, 8, 1, 1)
    np.testing.assert_allclose(fwd(merged), got, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(fwd(merged, stride=2, pad=1), y_sp, atol=1e-4, rtol=1e-4)

    # depthwise 1x1 (I == 1) is pointless and excluded
    with pytest.raises(VispError):
        add_lora({"dw.weight": np.zeros((8, 1, 1, 1), np.float32)}, targets=r"dw")


def test_merge_and_strip_parity():
    rng = np.random.default_rng(3)
    base = _base()
    adapted = add_lora(base, rank=4, seed=7)
    # simulate training: move both adapter halves off their init
    for k in list(adapted):
        if k.endswith((".lora_a", ".lora_b")):
            adapted[k] = rng.normal(size=adapted[k].shape).astype(np.float32) * 0.1
    x = rng.normal(size=(5, 16)).astype(np.float32)
    y_adapter = np.asarray(_forward(adapted, x))
    merged = merge_lora(adapted)
    assert lora_modules(merged) == []
    assert merged["enc.fc1.weight"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(_forward(merged, x)), y_adapter, atol=1e-5, rtol=1e-5)
    # strip: back to the pristine base, bit-exact
    stripped = strip_lora(adapted)
    np.testing.assert_array_equal(
        np.asarray(_forward(stripped, x)), np.asarray(_forward(base, x))
    )


def test_merge_preserves_bf16_base_dtype():
    base = {"m.weight": jnp.asarray(np.random.default_rng(0).normal(size=(8, 8)), jnp.bfloat16)}
    adapted = add_lora(base, rank=2)
    adapted["m.lora_b"] = np.full((8, 2), 0.25, np.float32)
    merged = merge_lora(adapted)
    assert merged["m.weight"].dtype == jnp.bfloat16


def test_train_only_adapters_move():
    rng = np.random.default_rng(4)
    base = _base()
    true = _base(seed=99)
    x = rng.normal(size=(32, 16)).astype(np.float32)
    y = np.asarray(_forward(true, x))

    def loss_fn(p, batch):
        bx, by = batch
        return jnp.mean((_forward(p, bx) - by) ** 2)

    adapted = add_lora(base, rank=8, seed=5)
    opt = optax.adam(2e-2)
    state = create_train_state(adapted, opt, trainable=LORA_TRAINABLE)
    step = make_train_step(loss_fn, opt, trainable=LORA_TRAINABLE)
    losses = []
    for _ in range(60):
        state, m = step(state, (x, y))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    # base weights are bit-frozen; adapters moved
    for k in ("enc.fc1.weight", "enc.fc2.weight", "enc.fc1.bias"):
        np.testing.assert_array_equal(np.asarray(state.params[k]), base[k])
    assert float(np.abs(np.asarray(state.params["enc.fc1.lora_b"])).max()) > 0
    # optimizer state covers ONLY the 4 adapter leaves
    adam_mu = state.opt_state[0].mu
    assert sorted(adam_mu) == [
        "enc.fc1.lora_a", "enc.fc1.lora_b", "enc.fc2.lora_a", "enc.fc2.lora_b",
    ]


def test_adapter_file_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    base = _base()
    adapted = add_lora(base, rank=4, seed=11)
    for k in list(adapted):
        if k.endswith((".lora_a", ".lora_b")):
            adapted[k] = rng.normal(size=adapted[k].shape).astype(np.float32) * 0.1
    path = save_lora(adapted, tmp_path / "adapter.gguf", arch="depthany")
    back = load_lora(strip_lora(adapted), path)
    assert lora_modules(back) == ["enc.fc1", "enc.fc2"]
    for mod in lora_modules(back):
        for sfx in (".lora_a", ".lora_b"):
            np.testing.assert_array_equal(back[mod + sfx], np.asarray(adapted[mod + sfx]))
    x = rng.normal(size=(3, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(_forward(back, x)), np.asarray(_forward(adapted, x))
    )


def test_adapter_file_validation(tmp_path):
    from vision_tpu.core.gguf import GGUFWriter

    base = _base()
    adapted = add_lora(base, rank=4)
    path = save_lora(adapted, tmp_path / "a.gguf")
    # adapter applied to a model missing the base weight
    with pytest.raises(VispError):
        load_lora({"other.weight": np.zeros((4, 4), np.float32)}, path)
    # adapter applied to a mismatched base shape
    wrong = dict(base)
    wrong["enc.fc1.weight"] = np.zeros((24, 12), np.float32)
    with pytest.raises(VispError):
        load_lora(wrong, path)
    # a non-adapter GGUF is rejected up front
    w = GGUFWriter(str(tmp_path / "plain.gguf"), "esrgan")
    w.add_tensor("t.weight", np.zeros((2, 2), np.float32))
    w.write()
    with pytest.raises(VispError):
        load_lora(base, tmp_path / "plain.gguf")
    # saving without adapters is an error
    with pytest.raises(VispError):
        save_lora(base, tmp_path / "none.gguf")


def test_model_level_depthany_init_identity():
    """Adapters on a real model's attention linears: prediction unchanged
    at init (B=0), and the adapter names land under the dino block tree."""
    import torch
    from test_depth_anything import TDepthAnything
    from workbench import input_tensor, make_params, randomize, to_nhwc

    from vision_tpu.models.depth_anything import DepthAnythingParams, depthany_predict
    from vision_tpu.models.dino import DinoParams

    t = randomize(TDepthAnything())
    x = to_nhwc(input_tensor(1, 3, 56, 70))
    cfg = DepthAnythingParams(
        dino=DinoParams(patch_size=14, embed_dim=32, n_heads=4, n_layers=4),
        feature_layers=(0, 1, 2, 3),
    )
    store = make_params(t)
    y0 = np.asarray(depthany_predict(store, x, cfg))
    adapted = add_lora(store, rank=4, targets=r"attention\.(query|key|value)|output\.dense")
    assert any(".lora_a" in k for k in adapted), sorted(adapted)[:5]
    y1 = np.asarray(depthany_predict(Params(adapted), x, cfg))
    np.testing.assert_array_equal(y1, y0)


def test_lora_train_on_mesh_matches_single_device():
    """dp-mesh LoRA step == single-device step (the adapters replicate,
    the batch dp-shards; XLA inserts the grad psum)."""
    from vision_tpu.parallel import make_mesh

    base = _base()
    rng = np.random.default_rng(8)
    x = rng.normal(size=(16, 16)).astype(np.float32)
    y = rng.normal(size=(16, 8)).astype(np.float32)

    def loss_fn(p, batch):
        bx, by = batch
        return jnp.mean((_forward(p, bx) - by) ** 2)

    opt = optax.adam(1e-2)
    adapted = add_lora(base, rank=4, seed=3)

    single = create_train_state(adapted, opt, trainable=LORA_TRAINABLE)
    sstep = make_train_step(loss_fn, opt, trainable=LORA_TRAINABLE)

    mesh = make_mesh(8)
    meshed = create_train_state(adapted, opt, mesh=mesh, trainable=LORA_TRAINABLE)
    mstep = make_train_step(loss_fn, opt, mesh=mesh, trainable=LORA_TRAINABLE)

    for _ in range(3):
        single, sm = sstep(single, (x, y))
        meshed, mm = mstep(meshed, (x, y))
    assert abs(float(sm["loss"]) - float(mm["loss"])) < 1e-6
    np.testing.assert_allclose(
        np.asarray(meshed.params["enc.fc1.lora_b"]),
        np.asarray(single.params["enc.fc1.lora_b"]),
        atol=1e-6, rtol=1e-6,
    )


def test_qlora_quantized_base():
    """QLoRA: adapters attach to a block-quantized resident base without
    densifying it. The base stays integer-resident AND frozen (even under
    trainable=None — an optimizer can't step quantized levels), only the
    adapters train, and merge dequantizes into a plain dense weight."""
    import optax

    from vision_tpu.core.quant import QuantResident, quantize_resident
    from vision_tpu.ops.nn import linear
    from vision_tpu.train import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    w = (rng.normal(size=(32, 64)) * 0.1).astype(np.float32)
    base = {
        "trunk.fc.weight": quantize_resident(w, dtype="float32"),
        "trunk.fc.bias": np.zeros(32, np.float32),
    }
    p = add_lora(base, rank=4, targets=r"trunk\.fc", seed=1)
    assert lora_modules(p) == ["trunk.fc"]
    assert isinstance(p["trunk.fc.weight"], QuantResident)  # no densify

    x = rng.normal(size=(8, 64)).astype(np.float32)
    y = rng.normal(size=(8, 32)).astype(np.float32)

    def loss_fn(pp, batch):
        bx, by = batch
        return jnp.mean((linear(Params(pp)["trunk"]["fc"], bx) - by) ** 2)

    opt = optax.adam(1e-2)
    # default trainable=None: the quant base is frozen by definition; the
    # trainable set is exactly {bias, lora_a, lora_b}
    state = create_train_state(p, opt, trainable=None)
    assert sorted(state.opt_state[0].mu.keys()) == [
        "trunk.fc.bias", "trunk.fc.lora_a", "trunk.fc.lora_b"]
    step = make_train_step(loss_fn, opt, trainable=LORA_TRAINABLE)
    state2 = create_train_state(p, opt, trainable=LORA_TRAINABLE)
    l0 = None
    for _ in range(5):
        state2, m = step(state2, (jnp.asarray(x), jnp.asarray(y)))
        if l0 is None:
            l0 = float(m["loss"])
    assert float(m["loss"]) < l0  # the adapters learned
    assert isinstance(state2.params["trunk.fc.weight"], QuantResident)

    merged = merge_lora(state2.params)
    md = np.asarray(merged["trunk.fc.weight"])
    assert md.shape == (32, 64) and md.dtype == np.float32
    assert not np.array_equal(md, w)  # the low-rank delta landed


def test_merge_adapter_deploy(tmp_path):
    """Deploy-time adapter composition (api.merge_adapter / --adapter):
    base GGUF + saved adapter file -> merged deployable file whose
    outputs match the in-memory merge exactly and differ from the base."""
    import torch

    from test_depth_anything import TDepthAnything
    from workbench import randomize
    from vision_tpu.api import load_model, merge_adapter
    from vision_tpu.convert.convert import convert_model
    from vision_tpu.core.device import BackendType, backend_init
    from vision_tpu.core.gguf import GGUFFile
    from vision_tpu.core.weights import load_weights
    from vision_tpu.image import image_load_array
    from vision_tpu.lora import save_lora
    from vision_tpu.models.depth_anything import fixup_weights
    from vision_tpu.train import export_gguf

    torch.manual_seed(0)
    t = randomize(TDepthAnything())
    torch.save(t.state_dict(), tmp_path / "b.pth")
    base_path = convert_model("depth-anything", tmp_path / "b.pth", tmp_path / "base.gguf")

    f = GGUFFile(str(base_path))
    sem = fixup_weights(f, load_weights(f, as_numpy=True))
    rng = np.random.default_rng(1)
    attached = add_lora(sem, rank=2, seed=3)
    for m in lora_modules(attached):
        attached[m + ".lora_b"] = (
            rng.normal(size=attached[m + ".lora_b"].shape) * 0.5
        ).astype(np.float32)
    save_lora(attached, tmp_path / "ad.gguf", arch=f.arch)
    # reference: the in-memory merge exported directly
    export_gguf(merge_lora(attached), tmp_path / "ref.gguf", source=f)

    merged_path = merge_adapter(base_path, tmp_path / "ad.gguf", dst=tmp_path / "m.gguf")
    dev = backend_init(BackendType.cpu)
    img = image_load_array(rng.integers(0, 256, (30, 32, 3)).astype(np.uint8))
    out_m = np.asarray(load_model(merged_path, dev).compute(img).data)
    out_r = np.asarray(load_model(str(tmp_path / "ref.gguf"), dev).compute(img).data)
    out_b = np.asarray(load_model(str(base_path), dev).compute(img).data)
    np.testing.assert_allclose(out_m, out_r, atol=1e-5)
    assert np.abs(out_m - out_b).max() > 1e-4  # the adapter changed the model

    # load_model(adapter=) composes the same way (temp merged file)
    out_a = np.asarray(load_model(base_path, dev, adapter=str(tmp_path / "ad.gguf")).compute(img).data)
    np.testing.assert_allclose(out_a, out_m, atol=1e-5)


def test_qlora_checkpoint_roundtrip(tmp_path):
    """QLoRA state survives orbax checkpoint/resume: QuantResident leaves
    (registered pytree) round-trip and a restored step matches the
    uninterrupted one bit-exactly."""
    import optax

    from vision_tpu.core.quant import QuantResident, quantize_resident
    from vision_tpu.ops.nn import linear
    from vision_tpu.train import (
        create_train_state,
        make_train_step,
        restore_checkpoint,
        save_checkpoint,
    )

    rng = np.random.default_rng(0)
    w = (rng.normal(size=(32, 64)) * 0.1).astype(np.float32)
    p = add_lora(
        {"fc.weight": quantize_resident(w, dtype="float32"),
         "fc.bias": np.zeros(32, np.float32)},
        rank=4, targets="fc", seed=1,
    )
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))

    def loss_fn(pp, b):
        return jnp.mean((linear(Params(pp)["fc"], b[0]) - b[1]) ** 2)

    opt = optax.adam(1e-2)
    state = create_train_state(p, opt, trainable=LORA_TRAINABLE)
    step = make_train_step(loss_fn, opt, trainable=LORA_TRAINABLE)
    state, _ = step(state, (x, y))
    save_checkpoint(tmp_path / "step_1", state)
    restored = restore_checkpoint(
        tmp_path / "step_1", create_train_state(p, opt, trainable=LORA_TRAINABLE)
    )
    assert isinstance(restored.params["fc.weight"], QuantResident)
    s2a, _ = step(state, (x, y))
    s2b, _ = step(restored, (x, y))
    np.testing.assert_array_equal(
        np.asarray(s2a.params["fc.lora_b"]), np.asarray(s2b.params["fc.lora_b"]))

"""Training / fine-tuning subsystem (vision_tpu/train.py).

The reference is inference-only; these tests pin the north-star extra:
optax step correctness (loss descends, frozen/non-float leaves untouched),
gradient-accumulation exactness, orbax checkpoint/resume bit-exactness
(incl. sharded restore on the virtual mesh), and single-vs-mesh parity.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vision_tpu.train import (
    create_train_state,
    latest_checkpoint,
    make_train_step,
    prefetch_to_device,
    restore_checkpoint,
    save_checkpoint,
)


def _problem(seed=0):
    rng = np.random.default_rng(seed)
    params = {
        "head.w.weight": (rng.normal(size=(4, 8)) * 0.1).astype(np.float32),
        "head.w.bias": np.zeros(4, np.float32),
        "buf.count": np.array([1, 2, 3], np.int32),  # non-float buffer
    }
    w_true = rng.normal(size=(4, 8)).astype(np.float32)
    x = rng.normal(size=(16, 8)).astype(np.float32)
    y = x @ w_true.T
    return params, (x, y)


def _loss_fn(p, batch):
    x, y = batch
    pred = x @ p["head.w.weight"].T + p["head.w.bias"]
    return jnp.mean((pred - y) ** 2)


def test_train_step_descends_and_preserves_buffers():
    params, batch = _problem()
    opt = optax.adam(5e-2)
    state = create_train_state(params, opt)
    step = make_train_step(_loss_fn, opt)
    losses = []
    for _ in range(40):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    # realizable linear target: adam should collapse the loss
    assert losses[-1] < losses[0] * 0.05
    assert int(state.step) == 40
    np.testing.assert_array_equal(np.asarray(state.params["buf.count"]), [1, 2, 3])


def test_grad_accum_matches_full_batch():
    params, (x, y) = _problem()
    opt = optax.adam(5e-2)
    full = make_train_step(_loss_fn, opt)
    accum = make_train_step(_loss_fn, opt, accum=4)
    s_full, _ = full(create_train_state(params, opt), (x, y))
    s_acc, m = accum(
        create_train_state(params, opt), (x.reshape(4, 4, 8), y.reshape(4, 4, 4))
    )
    # equal-sized microbatches: mean-of-micro-grads == full-batch grad
    for k in ("head.w.weight", "head.w.bias"):
        np.testing.assert_allclose(
            np.asarray(s_acc.params[k]), np.asarray(s_full.params[k]), rtol=2e-6, atol=2e-7
        )
    assert np.isfinite(float(m["loss"]))


def test_grad_accum_rejects_wrong_leading_axis():
    params, (x, y) = _problem()
    opt = optax.sgd(1e-2)
    step = make_train_step(_loss_fn, opt, accum=4)
    state = create_train_state(params, opt)
    with pytest.raises(Exception, match="leading axis 4"):
        # 8 microbatches into an accum=4 step would silently double the lr
        step(state, (x.reshape(8, 2, 8), y.reshape(8, 2, 4)))


def test_export_gguf_host_bf16_casts(tmp_path):
    import jax.numpy as jnp

    from vision_tpu.core.gguf import GGUFFile, GGMLType
    from vision_tpu.train import export_gguf

    v = np.arange(8, dtype=np.float32).reshape(2, 4)
    params = {"w.weight": np.asarray(jnp.asarray(v, jnp.bfloat16))}  # host ml_dtypes bf16
    assert not np.issubdtype(params["w.weight"].dtype, np.floating)  # the trap
    path = export_gguf(params, tmp_path / "bf16.gguf", arch="esrgan", float_type="f16")
    f = GGUFFile(path)
    assert f.tensors["w.weight"].ggml_type == GGMLType.F16
    np.testing.assert_allclose(f.tensor("w.weight"), v, atol=1e-2)


def test_trainable_predicate_freezes_rest():
    params, batch = _problem()
    opt = optax.adam(5e-2)
    step = make_train_step(_loss_fn, opt, trainable=r"\bbias$")
    state = create_train_state(params, opt, trainable=r"\bbias$")
    state, _ = step(state, batch)
    np.testing.assert_array_equal(
        np.asarray(state.params["head.w.weight"]), params["head.w.weight"]
    )
    assert not np.array_equal(np.asarray(state.params["head.w.bias"]), params["head.w.bias"])


def test_create_train_state_rejects_all_frozen():
    params, _ = _problem()
    with pytest.raises(Exception, match="no trainable"):
        create_train_state(params, optax.sgd(1e-2), trainable=r"\bnot_a_param$")


def test_checkpoint_resume_bitexact(tmp_path):
    params, batch = _problem()
    opt = optax.adam(5e-2)
    step = make_train_step(_loss_fn, opt)
    state = create_train_state(params, opt)
    for _ in range(3):
        state, _ = step(state, batch)
    path = save_checkpoint(tmp_path / "step_3", state)
    assert latest_checkpoint(tmp_path) == path

    resumed = restore_checkpoint(path, state)
    a, b = state, resumed
    for _ in range(2):
        a, _ = step(a, batch)
        b, _ = step(b, batch)
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_latest_checkpoint_ordering(tmp_path):
    assert latest_checkpoint(tmp_path / "missing") is None
    for n in (1, 10, 2):
        os.makedirs(tmp_path / f"step_{n}")
    os.makedirs(tmp_path / "not_a_step")
    assert latest_checkpoint(tmp_path) == str(tmp_path / "step_10")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fsdp_param_sharding_parity():
    """ZeRO-style dp-sharded params + opt state: placement is actually
    partitioned, numerics match the single-device step exactly, and the
    updated state keeps its partitioned placement."""
    from vision_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    params = {
        "big.table": (rng.normal(size=(512, 130)) * 0.02).astype(np.float32),
        "head.w.weight": (rng.normal(size=(4, 8)) * 0.1).astype(np.float32),
    }
    x = rng.normal(size=(16, 8)).astype(np.float32)
    y = rng.normal(size=(16, 4)).astype(np.float32)

    def loss_fn(p, batch):
        xb, yb = batch
        pred = xb @ p["head.w.weight"].T
        # touch the fsdp-sharded table so it gets a gradient
        return jnp.mean((pred - yb) ** 2) + 1e-3 * jnp.mean(p["big.table"] ** 2)

    def dp_sharded_dim0(arr):
        # P("dp") and P("dp", None) are the same placement but compare
        # unequal lexically — check semantically
        spec = tuple(arr.sharding.spec)
        return len(spec) >= 1 and spec[0] == "dp" and all(s is None for s in spec[1:])

    opt = optax.adam(1e-2)
    mesh = make_mesh(8, tp=2)  # dp=4
    state = create_train_state(params, opt, mesh=mesh, fsdp=True, fsdp_min_size=1024)
    assert dp_sharded_dim0(state.params["big.table"])
    # small tensor stays replicated
    assert all(s is None for s in tuple(state.params["head.w.weight"].sharding.spec))
    # adam slots follow the param partitioning (the ZeRO memory win)
    m_leaf = jax.tree_util.tree_leaves(state.opt_state)
    assert any(
        getattr(l, "sharding", None) is not None and l.ndim == 2 and dp_sharded_dim0(l)
        for l in m_leaf
    )

    step = make_train_step(loss_fn, opt, mesh=mesh)
    ref_state = create_train_state(params, opt)
    ref_step = make_train_step(loss_fn, opt)
    for _ in range(2):
        state, m = step(state, (x, y))
        ref_state, rm = ref_step(ref_state, (x, y))
    np.testing.assert_allclose(float(m["loss"]), float(rm["loss"]), rtol=1e-6)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(state.params[k]), np.asarray(ref_state.params[k]), rtol=2e-6, atol=2e-7
        )
    # updated params keep the partitioned placement (no silent re-replication)
    assert dp_sharded_dim0(state.params["big.table"])


def test_export_gguf_roundtrip_from_cwhn_source(tmp_path):
    """load (cwhn file) -> fine-tune-shaped params -> export -> reload:
    arrays equal, arch KVs preserved, layout markers dropped (the export
    stores torch-canonical, so an echoed cwhn marker would double-permute
    on reload)."""
    from vision_tpu.core.gguf import GGUFFile, GGUFWriter
    from vision_tpu.core.weights import load_weights
    from vision_tpu.train import export_gguf

    rng = np.random.default_rng(0)
    conv = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)  # torch (O,I,H,W)
    bias = rng.normal(size=(8,)).astype(np.float32)
    src = tmp_path / "src.gguf"
    w = GGUFWriter(src, "esrgan")
    w.add("esrgan.scale", 4)
    w.add("esrgan.tensor_data_layout", "cwhn")
    w.add("esrgan.conv2d_weights", [0])
    w.add_tensor("body.conv.weight", np.ascontiguousarray(conv.transpose(0, 2, 3, 1)))
    w.add_tensor("body.conv.bias", bias)
    w.write()

    params = load_weights(GGUFFile(src), as_numpy=True)
    np.testing.assert_array_equal(params["body.conv.weight"], conv)

    dst = tmp_path / "out.gguf"
    export_gguf(params, dst, source=src)
    back = GGUFFile(dst)
    assert back.arch == "esrgan"
    assert back.get_int("esrgan.scale") == 4
    # cwhn marker must NOT survive; the export declares all-torch-canonical
    # so the family fixup_weights passes skip their whcn special cases
    assert back.tensor_layout == "torch"
    assert back.conv2d_weight_indices() == []
    reloaded = load_weights(back, as_numpy=True)
    np.testing.assert_array_equal(reloaded["body.conv.weight"], conv)
    np.testing.assert_array_equal(reloaded["body.conv.bias"], bias)

    # f16 export halves storage; device (jax) arrays export fine too
    dev_params = {k: jnp.asarray(v) for k, v in params.items()}
    dst16 = tmp_path / "out16.gguf"
    export_gguf(dev_params, dst16, arch="esrgan", float_type="f16")
    r16 = load_weights(GGUFFile(dst16), as_numpy=True)
    np.testing.assert_allclose(r16["body.conv.weight"], conv, rtol=1e-3, atol=1e-3)
    with pytest.raises(Exception, match="float_type"):
        export_gguf(params, tmp_path / "bad.gguf", arch="esrgan", float_type="q8_0")
    with pytest.raises(Exception, match="arch"):
        export_gguf(params, tmp_path / "bad.gguf")


def test_data_loader_batching_and_shuffle():
    from vision_tpu.train import data_loader

    items = list(range(10))
    load = lambda i: {"x": np.full((2,), i, np.float32), "y": np.int32(i)}
    batches = list(data_loader(items, 4, load=load, workers=3))
    assert len(batches) == 2  # drop_last drops the trailing 2
    assert batches[0]["x"].shape == (4, 2)
    got = np.concatenate([b["y"] for b in batches]).tolist()
    assert got == list(range(8))  # order preserved without shuffle
    # keep_last keeps the ragged tail
    full = list(data_loader(items, 4, load=load, drop_last=False))
    assert [b["y"].shape[0] for b in full] == [4, 4, 2]
    # shuffle is a permutation, deterministic per seed
    s1 = np.concatenate([b["y"] for b in data_loader(items, 5, load=load, shuffle=True, seed=1)])
    s2 = np.concatenate([b["y"] for b in data_loader(items, 5, load=load, shuffle=True, seed=1)])
    np.testing.assert_array_equal(s1, s2)
    assert sorted(s1.tolist()) == items and s1.tolist() != items
    assert list(data_loader([], 4, load=load)) == []
    with pytest.raises(Exception, match="batch_size"):
        list(data_loader(items, 0, load=load))


def test_prefetch_to_device_order_and_placement():
    batches = [(np.full((8, 2), i, np.float32), np.full((8, 1), -i, np.float32)) for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert len(out) == 5
    for i, (x, y) in enumerate(out):
        assert isinstance(x, jax.Array)
        np.testing.assert_array_equal(np.asarray(x), batches[i][0])
        np.testing.assert_array_equal(np.asarray(y), batches[i][1])
    assert list(prefetch_to_device(iter([]), size=2)) == []
    with pytest.raises(Exception, match="size"):
        next(prefetch_to_device(iter(batches), size=0))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_prefetch_to_device_mesh_sharding():
    from jax.sharding import PartitionSpec as P

    from vision_tpu.parallel import make_mesh

    mesh = make_mesh(8, tp=2)
    batches = [(np.zeros((8, 2), np.float32),) for _ in range(3)]
    out = list(prefetch_to_device(iter(batches), size=2, mesh=mesh))
    assert len(out) == 3
    assert out[0][0].sharding.spec == P("dp")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_prefetch_accum_layout_and_parity():
    """prefetch_to_device(accum=K) dp-shards axis 1 (the samples), not the
    microbatch axis — the (K, micro, ...) layout make_train_step(accum=K)
    declares — and the accumulated mesh step matches the full-batch mesh
    step exactly (same contract as the single-device accum test)."""
    import optax
    from jax.sharding import PartitionSpec as P

    from vision_tpu.parallel import make_mesh

    mesh = make_mesh(8, tp=2)  # dp=4
    params, (x, y) = _problem()
    opt = optax.sgd(0.1)

    micro = [(np.zeros((3, 4, 8), np.float32),) for _ in range(2)]
    out = list(prefetch_to_device(iter(micro), mesh=mesh, accum=3))
    assert out[0][0].sharding.spec == P(None, "dp")

    full = make_train_step(_loss_fn, opt, mesh=mesh)
    acc = make_train_step(_loss_fn, opt, mesh=mesh, accum=4)
    s_full = create_train_state(params, opt, mesh=mesh)
    s_acc = create_train_state(params, opt, mesh=mesh)
    (bx,), = list(prefetch_to_device(iter([(x,)]), mesh=mesh))
    (by,), = list(prefetch_to_device(iter([(y,)]), mesh=mesh))
    s_full, mf = full(s_full, (bx, by))
    (ax,), = list(prefetch_to_device(iter([(x.reshape(4, 4, 8),)]), mesh=mesh, accum=4))
    (ay,), = list(prefetch_to_device(iter([(y.reshape(4, 4, 4),)]), mesh=mesh, accum=4))
    s_acc, ma = acc(s_acc, (ax, ay))
    np.testing.assert_allclose(
        np.asarray(s_acc.params["head.w.weight"]),
        np.asarray(s_full.params["head.w.weight"]), atol=2e-6,
    )
    np.testing.assert_allclose(float(ma["loss"]), float(mf["loss"]), atol=1e-6)

    with pytest.raises(Exception):
        next(prefetch_to_device(iter(micro), mesh=mesh, accum=0))


def test_finetune_depthany_head_smoke():
    """End-to-end: fine-tune a real family's head (depth-anything 'test'
    variant) against a synthetic depth target — the production fine-tune
    recipe (frozen backbone, trainable head) composes with a real model
    graph, and the loss descends."""
    from vision_tpu.core.params import Params
    from vision_tpu.models.depth_anything import DepthAnythingParams, depthany_predict
    from vision_tpu.models.dino import DinoParams
    from vision_tpu.models.random_weights import random_depth_anything_params

    dp = DepthAnythingParams(
        dino=DinoParams(embed_dim=64, n_heads=2, n_layers=4),
        image_size=56,
        feature_layers=(0, 1, 2, 3),
    )
    params = random_depth_anything_params("test")
    rng = np.random.default_rng(3)
    img = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    target = rng.uniform(0.2, 0.8, size=(2, 56, 56, 1)).astype(np.float32)

    def loss_fn(p, batch):
        x, y = batch
        return jnp.mean((depthany_predict(Params(p), x, dp) - y) ** 2)

    opt = optax.adam(1e-3)
    state = create_train_state(params, opt, trainable=r"^head\.")
    step = make_train_step(loss_fn, opt, trainable=r"^head\.")
    losses = []
    for _ in range(4):
        state, m = step(state, (img, target))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # backbone frozen bit-exact
    bk = next(k for k in params if k.startswith("backbone."))
    np.testing.assert_array_equal(np.asarray(state.params[bk]), params[bk])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_train_parity_and_sharded_restore(tmp_path):
    from vision_tpu.parallel import make_mesh

    params, batch = _problem()
    opt = optax.adam(5e-2)
    ref = create_train_state(params, opt)
    ref_step = make_train_step(_loss_fn, opt)

    mesh = make_mesh(8, tp=2)
    ms = create_train_state(params, opt, mesh=mesh)
    # the toy weights aren't tp-divisible by the rules (no qkv names), but
    # the batch dp-shards and the grad psum must still reproduce the
    # single-device step exactly
    mstep = make_train_step(_loss_fn, opt, mesh=mesh)
    for _ in range(2):
        ref, rm = ref_step(ref, batch)
        ms, mm = mstep(ms, batch)
    np.testing.assert_allclose(float(mm["loss"]), float(rm["loss"]), rtol=1e-5)
    for k in ("head.w.weight", "head.w.bias"):
        np.testing.assert_allclose(
            np.asarray(ms.params[k]), np.asarray(ref.params[k]), rtol=2e-6, atol=2e-7
        )

    path = save_checkpoint(tmp_path / "step_2", ms)
    fresh = create_train_state(params, opt, mesh=mesh)
    restored = restore_checkpoint(path, fresh)
    assert restored.params["head.w.weight"].sharding == ms.params["head.w.weight"].sharding
    for la, lb in zip(jax.tree_util.tree_leaves(ms), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # a restored state must be steppable: every leaf (incl. adam's count
    # slot) lives on the mesh, not the default device (regression: the
    # optimizer.init scalars used to stay on device 0)
    stepped, _ = mstep(restored, batch)
    assert int(stepped.step) == 3


def test_ema_update():
    from vision_tpu.train import ema_update

    params = {"w.weight": np.ones((4, 4), np.float32), "buf.count": np.array([1, 2], np.int32)}
    ema = {"w.weight": np.zeros((4, 4), np.float32), "buf.count": np.array([0, 0], np.int32)}
    out = ema_update(ema, params, decay=0.9)
    # float leaf: 0.9*0 + 0.1*1; non-float buffer tracks params verbatim
    np.testing.assert_allclose(np.asarray(out["w.weight"]), 0.1, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["buf.count"]), [1, 2])
    # converges onto params under repetition, and jits
    step = jax.jit(ema_update, static_argnames=("decay",))
    for _ in range(200):
        ema = step(ema, params, decay=0.9)
    np.testing.assert_allclose(np.asarray(ema["w.weight"]), 1.0, atol=1e-6)

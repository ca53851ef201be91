"""Build-flag plumbing: every flash/deform-capable model must consume
``device.flags`` (reference model_build_flags, ml.cpp:164-201 — VISP_FLASH_
ATTENTION etc. alter graph construction). Asserted at trace time via
``jax.eval_shape`` with recorders monkeypatched into the op layer, so
neither lowering nor compilation happens."""

import numpy as np
import pytest

from vision_tpu.core.device import BackendType, BuildFlag, backend_init


@pytest.fixture
def cpu_device():
    return backend_init(BackendType.cpu)


def _record_attention_core(monkeypatch, calls):
    import vision_tpu.ops.nn as nn

    orig = nn.attention_core

    def spy(q, k, v, mask=None, scale=None, flash=False):
        calls.append(flash)
        return orig(q, k, v, mask, scale, flash=False)

    monkeypatch.setattr(nn, "attention_core", spy)


def test_sam_model_uses_fused_window_attention(monkeypatch, cpu_device):
    """TinyViT windowed attention routes through the no-transpose fused
    path (ops.nn.attention_windows) unconditionally — it is exact and
    strictly faster than both the naive and dot_product_attention paths
    (scripts/exp_winattn3.py), so the flash flag is subsumed for windows.
    The decoder's cross-attention still uses attention_core."""
    import jax
    import jax.numpy as jnp

    import vision_tpu.models.mobile_sam as ms
    from vision_tpu.models.mobile_sam import SamModel, SamParams
    from vision_tpu.models.random_weights import random_mobile_sam_params

    calls: list[int] = []
    orig = ms.attention_windows

    def spy(p, x, n_heads, split_dim, mask, scale):
        calls.append(n_heads)
        return orig(p, x, n_heads, split_dim, mask, scale)

    monkeypatch.setattr(ms, "attention_windows", spy)
    params = random_mobile_sam_params(seed=0)
    model = SamModel(params, SamParams(), cpu_device.with_flags(BuildFlag.flash_attention))
    jax.eval_shape(model._enc, params, jnp.zeros((1, 1024, 1024, 3), jnp.uint8))
    model._enc.clear_cache()  # the spy-traced jaxpr must not leak: executables are shared across instances
    # 2 + 6 + 2 attention blocks across stages 1-3
    assert len(calls) == 10, calls


def test_sam3_model_consumes_flash_flag(monkeypatch, cpu_device):
    import jax
    import jax.numpy as jnp

    from vision_tpu.models.sam3 import Sam3Model, Sam3VitParams
    from vision_tpu.models.random_weights import random_sam3_vision_params

    calls: list[bool] = []
    _record_attention_core(monkeypatch, calls)
    params = {f"det.ve.{k}": v for k, v in random_sam3_vision_params(dim=64, layers=4).items()}

    class _Tok:  # tokenizer unused for vision tracing
        pass

    vp = Sam3VitParams(n_layers=4, n_heads=2, global_attn_indexes=(1, 3))
    model = Sam3Model(params, _Tok(), 32, cpu_device.with_flags(BuildFlag.flash_attention), vp=vp)
    jax.eval_shape(model._vision_fn, params, model._vision_stack(), jnp.zeros((1, 1008, 1008, 3), jnp.float32))
    model._vision_fn.clear_cache()
    assert calls and any(calls), "flash flag must reach the global attention layers"

    calls.clear()
    model = Sam3Model(params, _Tok(), 32, cpu_device, vp=vp)
    jax.eval_shape(model._vision_fn, params, model._vision_stack(), jnp.zeros((1, 1008, 1008, 3), jnp.float32))
    model._vision_fn.clear_cache()
    # without the flag nothing routes through attention_core's flash path:
    # window layers always use the transpose-free einsum formulation and
    # global layers fall back to it too (rope_attention non-flash branch)
    assert not any(calls)


def test_birefnet_model_consumes_deform_shift_flag(monkeypatch, cpu_device):
    import jax
    import jax.numpy as jnp

    import vision_tpu.models.birefnet as bn
    from vision_tpu.models.birefnet import BirefnetModel, BirefnetParams
    from vision_tpu.models.random_weights import random_birefnet_params
    from vision_tpu.models.swin import SWIN_T_PARAMS

    # the spies return shape-correct zeros instead of calling the real op:
    # this test asserts ROUTING (which deform formulation the flag selects,
    # with which bound), not numerics (tests/test_birefnet.py covers those),
    # and tracing the real 25-window shift unroll costs ~45 s of the suite
    def _deform_out(x, w, off):
        # (B, Ho, Wo, Cout): Ho/Wo follow the offset grid, Cout = w.shape[0]
        return jnp.zeros((x.shape[0], off.shape[1], off.shape[2], w.shape[0]), x.dtype)

    bounds: list[int | None] = []

    def spy(x, w, off, m, stride, pad, bound):
        bounds.append(bound)
        return _deform_out(x, w, off)

    monkeypatch.setattr(bn, "deform_conv_2d_shift", spy)
    gathers: list[bool] = []

    def spy_g(x, w, off, m=None, stride=1, pad=0, **kw):
        gathers.append(True)
        return _deform_out(x, w, off)

    monkeypatch.setattr(bn, "deform_conv_2d", spy_g)

    params = random_birefnet_params("tiny")
    p = BirefnetParams(image_size=256, image_extent=(256, 256), encoder=SWIN_T_PARAMS)
    model = BirefnetModel(params, p, cpu_device.with_flags(BuildFlag.deform_shift))
    fn = model._fn((256, 256))
    jax.eval_shape(fn, params, jnp.zeros((1, 256, 256, 3), jnp.uint8))
    fn.clear_cache()  # the spy returns zeros; a leaked trace would corrupt shared executables
    assert bounds and all(b == 2 for b in bounds) and not gathers

    bounds.clear()
    model = BirefnetModel(params, p, cpu_device)
    fn = model._fn((256, 256))
    jax.eval_shape(fn, params, jnp.zeros((1, 256, 256, 3), jnp.uint8))
    fn.clear_cache()
    assert gathers and not bounds


def test_tpu_default_flags_include_fast_paths():
    from vision_tpu.core.device import backend_default_flags

    flags = backend_default_flags(BackendType.tpu)
    assert flags & BuildFlag.flash_attention
    assert flags & BuildFlag.deform_shift
    assert not backend_default_flags(BackendType.cpu) & BuildFlag.deform_shift


def test_compile_cache_env_persists_programs(tmp_path, monkeypatch):
    """VISP_COMPILE_CACHE=<dir> turns on JAX's persistent compilation cache
    so serving cold starts reuse compiled programs across processes (the
    TPU answer to the reference's <100 ms init, README.md:195-197)."""
    import jax
    import jax.numpy as jnp

    from jax._src import compilation_cache as _cc

    cache = tmp_path / "xla-cache"
    cache.mkdir()
    monkeypatch.setenv("VISP_COMPILE_CACHE", str(cache))
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min_time = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_min_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    # the persistent cache initializes once per process; conftest may have
    # already pointed it at the suite cache, so force re-init for this dir
    _cc.reset_cache()
    try:
        backend_init(BackendType.cpu)

        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T

        np_x = np.random.default_rng(0).standard_normal((192, 192)).astype(np.float32)
        f(jnp.asarray(np_x)).block_until_ready()
        assert any(cache.iterdir()), "no programs written to the compilation cache"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min_time)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_min_size)
        _cc.reset_cache()


def test_compile_cache_defaults_on_for_production_entries(monkeypatch):
    """With VISP_COMPILE_CACHE unset, backend_init points the persistent
    compile cache at ~/.cache/vision_tpu/xla — production CLI/serving/
    training processes must not pay a multi-minute remote recompile per
    cold start (NOTES.md round-4f: a cold serving warmup took ~25 min on a
    degraded tunnel). Empty VISP_COMPILE_CACHE disables; an application
    that already configured jax_compilation_cache_dir keeps its setting."""
    import os

    import jax

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min_time = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        # an already-configured dir (conftest's suite cache here) wins
        monkeypatch.delenv("VISP_COMPILE_CACHE", raising=False)
        backend_init(BackendType.cpu)
        assert jax.config.jax_compilation_cache_dir == prev_dir
        # unset env + unconfigured dir -> the default location
        jax.config.update("jax_compilation_cache_dir", None)
        backend_init(BackendType.cpu)
        got = jax.config.jax_compilation_cache_dir
        assert got is not None and got.endswith(os.path.join("vision_tpu", "xla"))
        # empty env -> explicitly disabled
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("VISP_COMPILE_CACHE", "")
        backend_init(BackendType.cpu)
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min_time)


def test_flag_env_disable_spellings(monkeypatch):
    """'OFF'/'False'/'no' must DISABLE a flag, not force-enable it (the
    reference honors VISP_FLASH_ATTENTION=0; review r4c made the env parse
    case-insensitive with the common falsy spellings)."""
    from vision_tpu.core.device import backend_default_flags

    for v in ("OFF", "False", "no", "0", ""):
        monkeypatch.setenv("VISP_FLASH_ATTENTION", v)
        assert not backend_default_flags(BackendType.tpu) & BuildFlag.flash_attention, v
    for v in ("ON", "1", "true"):
        monkeypatch.setenv("VISP_FLASH_ATTENTION", v)
        assert backend_default_flags(BackendType.cpu) & BuildFlag.flash_attention, v


def test_backend_is_available_cpu_is_constant():
    """CPU availability answers True without enumerating devices — device
    enumeration initializes every PJRT plugin (the tunnel stall
    backend_init(cpu) exists to avoid) and would forfeit the CPU pin."""
    from vision_tpu.core.device import backend_is_available

    assert backend_is_available(BackendType.cpu) is True

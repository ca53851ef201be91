"""Build-flag plumbing: every flash/deform-capable model must consume
``device.flags`` (reference model_build_flags, ml.cpp:164-201 — VISP_FLASH_
ATTENTION etc. alter graph construction). Asserted at trace time via
``jit.lower`` with recorders monkeypatched into the op layer, so no
compilation happens."""

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
    model._enc.lower(params, jnp.zeros((1, 1024, 1024, 3), jnp.uint8))
    # 2 + 6 + 2 attention blocks across stages 1-3
    assert len(calls) == 10, calls


def test_sam3_model_consumes_flash_flag(monkeypatch, cpu_device):
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
    model._vision_fn.lower(params, model._vision_stack(), jnp.zeros((1, 1008, 1008, 3), jnp.float32))
    assert calls and any(calls), "flash flag must reach the global attention layers"

    calls.clear()
    model = Sam3Model(params, _Tok(), 32, cpu_device, vp=vp)
    model._vision_fn.lower(params, model._vision_stack(), jnp.zeros((1, 1008, 1008, 3), jnp.float32))
    # without the flag nothing routes through attention_core's flash path:
    # window layers always use the transpose-free einsum formulation and
    # global layers fall back to it too (rope_attention non-flash branch)
    assert not any(calls)


def test_birefnet_model_consumes_deform_shift_flag(monkeypatch, cpu_device):
    import jax.numpy as jnp

    import vision_tpu.models.birefnet as bn
    from vision_tpu.models.birefnet import BirefnetModel, BirefnetParams
    from vision_tpu.models.random_weights import random_birefnet_params
    from vision_tpu.models.swin import SWIN_T_PARAMS

    bounds: list[int | None] = []
    orig = bn.deform_conv_2d_shift

    def spy(x, w, off, m, stride, pad, bound):
        bounds.append(bound)
        return orig(x, w, off, m, stride, pad, bound=bound)

    monkeypatch.setattr(bn, "deform_conv_2d_shift", spy)
    gathers: list[bool] = []
    orig_g = bn.deform_conv_2d

    def spy_g(*a, **kw):
        gathers.append(True)
        return orig_g(*a, **kw)

    monkeypatch.setattr(bn, "deform_conv_2d", spy_g)

    params = random_birefnet_params("tiny")
    p = BirefnetParams(image_size=256, image_extent=(256, 256), encoder=SWIN_T_PARAMS)
    model = BirefnetModel(params, p, cpu_device.with_flags(BuildFlag.deform_shift))
    model._fn((256, 256)).lower(params, jnp.zeros((1, 256, 256, 3), jnp.uint8))
    assert bounds and all(b == 2 for b in bounds) and not gathers

    bounds.clear()
    model = BirefnetModel(params, p, cpu_device)
    model._fn((256, 256)).lower(params, jnp.zeros((1, 256, 256, 3), jnp.uint8))
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

    cache = tmp_path / "xla-cache"
    cache.mkdir()
    monkeypatch.setenv("VISP_COMPILE_CACHE", str(cache))
    try:
        backend_init(BackendType.cpu)

        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T

        np_x = np.random.default_rng(0).standard_normal((192, 192)).astype(np.float32)
        f(jnp.asarray(np_x)).block_until_ready()
        assert any(cache.iterdir()), "no programs written to the compilation cache"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)  # global config

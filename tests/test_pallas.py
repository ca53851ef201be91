"""Pallas kernel tests (interpret mode on CPU; compiled path is exercised
by the TPU benchmarks)."""

import numpy as np
import pytest
import torch

from vision_tpu.ops.pallas.flash_attention import flash_attention


@pytest.mark.parametrize("t,d,block_q", [(256, 64, 128), (300, 32, 128), (64, 64, 256)])
def test_flash_attention_matches_naive(t, d, block_q):
    g = torch.Generator().manual_seed(0)
    q = torch.randn(2, 3, t, d, generator=g)
    k = torch.randn(2, 3, t, d, generator=g)
    v = torch.randn(2, 3, t, d, generator=g)
    scale = d**-0.5
    attn = (q @ k.transpose(-1, -2)) * scale
    expected = (attn.softmax(-1) @ v).numpy()
    out = flash_attention(q.numpy(), k.numpy(), v.numpy(), scale=scale, block_q=block_q, interpret=True)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5, rtol=1e-4)


def test_flash_attention_cross():
    """Tq != Tk (decoder-style cross attention)."""
    g = torch.Generator().manual_seed(1)
    q = torch.randn(1, 2, 7, 32, generator=g)
    k = torch.randn(1, 2, 150, 32, generator=g)
    v = torch.randn(1, 2, 150, 32, generator=g)
    attn = (q @ k.transpose(-1, -2)) * 32**-0.5
    expected = (attn.softmax(-1) @ v).numpy()
    out = flash_attention(q.numpy(), k.numpy(), v.numpy(), block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5, rtol=1e-4)


def test_rdb_fused_matches_xla_chain():
    """Experimental fused RDB kernel (interpret mode): numerically matches
    the XLA dense-block chain incl. image-border semantics."""
    import jax.numpy as jnp

    from vision_tpu.core.params import Params
    from vision_tpu.models.esrgan import residual_dense_block
    from vision_tpu.ops.pallas.rdb import rdb_fused, rdb_weights_from_params

    rng = np.random.default_rng(0)
    nf, gc = 64, 32
    store = {}
    cins = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
    couts = [gc, gc, gc, gc, nf]
    for i, (ci, co) in enumerate(zip(cins, couts), 1):
        store[f"conv{i}.0.weight"] = (rng.standard_normal((co, ci, 3, 3)) * 0.05).astype(np.float32)
        store[f"conv{i}.0.bias"] = (rng.standard_normal(co) * 0.01).astype(np.float32)
    p = Params(store)
    x = rng.standard_normal((1, 64, 128, nf)).astype(np.float32)
    expected = np.asarray(residual_dense_block(p, jnp.asarray(x)))
    weights = rdb_weights_from_params(p, dtype=jnp.float32)
    got = np.asarray(rdb_fused(jnp.asarray(x), weights, tile=32, interpret=True))
    diff = np.abs(expected - got)
    assert diff.max() < 5e-3 and np.sqrt((diff**2).mean()) < 1e-4

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




def test_flash_attention_rejects_mask():
    q = np.zeros((1, 1, 8, 8), np.float32)
    with pytest.raises(ValueError, match="mask"):
        flash_attention(q, q, q, mask=np.zeros((8, 8), np.float32))


def test_flash_attention_bf16_dtype():
    """bf16 inputs (the TPU production dtype) stay bf16 out, f32 accumulate."""
    import jax.numpy as jnp

    g = torch.Generator().manual_seed(2)
    q = torch.randn(1, 2, 128, 32, generator=g)
    attn = (q @ q.transpose(-1, -2)) * 32**-0.5
    expected = (attn.softmax(-1) @ q).numpy()
    qb = jnp.asarray(q.numpy(), jnp.bfloat16)
    out = flash_attention(qb, qb, qb, block_q=128, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=0.05, rtol=0.05)


def test_attention_route_policy():
    """The routing table in ops/nn.py, asserted case by case."""
    from vision_tpu.ops.nn import FUSED_LOGIT_MAX_T, PALLAS_MIN_T, attention_route

    # no flash -> always naive
    assert attention_route(5184, False, False) == "naive"
    assert attention_route(49, True, False) == "naive"
    # flash + no mask + big T -> pallas when available, else xla_fused
    assert attention_route(PALLAS_MIN_T, False, True, pallas_ok=True) == "pallas"
    assert attention_route(PALLAS_MIN_T, False, True, pallas_ok=False) == "xla_fused"
    # flash + mask + small T (TinyViT/SWIN windows) -> bf16-logit naive
    assert attention_route(49, True, True) == "fused_logits"
    assert attention_route(FUSED_LOGIT_MAX_T, True, True) == "fused_logits"
    # the previously-silent middle cases are explicit xla_fused now
    assert attention_route(FUSED_LOGIT_MAX_T + 1, True, True) == "xla_fused"   # masked mid-size
    assert attention_route(256, False, True, pallas_ok=True) == "xla_fused"    # unmasked small

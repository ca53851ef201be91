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



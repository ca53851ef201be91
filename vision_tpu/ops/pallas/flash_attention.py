"""Pallas fused attention kernel (TPU).

Replaces the reference's ggml_flash_attn_ext path (src/visp/nn.cpp:217-227)
for the mask-free large-sequence attentions in this suite — DINOv2 at
dynamic resolutions (~1.4-2.7k tokens) and SAM3 global layers (5184 tokens
at 1008px). Softmax statistics accumulate in f32 like the reference's
GGML_PREC_F32 setting.

Design: one grid step per (batch*heads, q-block). K/V for the whole row
live in VMEM (T <= ~8k at head_dim <= 128 fits comfortably in 16 MB), so
each step is a single fused QK^T -> softmax -> PV chain on the MXU with no
HBM round-trip for the logits — the fusion XLA won't do across the softmax.
Windowed attentions (tiny T, additive bias) stay on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["flash_attention", "pallas_available"]


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (T, d)
    v = v_ref[0]  # (T, d)
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bq, T)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return False


def flash_attention(
    q, k, v, scale: float | None = None, block_q: int = 256, interpret: bool = False, mask=None
):
    """Fused softmax(q k^T * scale) v. q, k, v: (B, H, T, D).

    The kernel supports NO mask/bias (by design — its consumers are the
    mask-free global attentions; masked shapes route through
    attention_core's policy instead). Rejecting explicitly beats silently
    ignoring a mask a future caller passes. Returns (B, H, Tq, D).
    """
    if mask is not None:
        raise ValueError(
            "flash_attention does not support masks; use attention_core (it routes "
            "masked shapes to the XLA paths)"
        )
    return _flash_attention(q, k, v, scale=scale, block_q=block_q, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret"))
def _flash_attention(q, k, v, scale: float | None = None, block_q: int = 256, interpret: bool = False):
    from jax.experimental import pallas as pl

    b, h, tq, d = q.shape
    tk = k.shape[2]
    if scale is None:
        scale = d**-0.5
    bh = b * h
    qf = q.reshape(bh, tq, d)
    kf = k.reshape(bh, tk, d)
    vf = v.reshape(bh, tk, d)
    bq = min(block_q, tq)
    # pad tq to a multiple of bq (extra rows compute garbage, sliced off)
    pad = (-tq) % bq
    if pad:
        qf = jnp.pad(qf, ((0, 0), (0, pad), (0, 0)))
    nq = qf.shape[1] // bq

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, qf.shape[1], d), q.dtype),
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qf, kf, vf)
    if pad:
        out = out[:, :tq]
    return out.reshape(b, h, tq, d)

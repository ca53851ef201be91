"""Pallas fused windowed attention with additive bias (TPU).

Covers the small-window attention pattern that dominates this suite
(TinyViT 7x7/14x14 windows, reference mobile-sam.cpp:124-161; the shared
attention path nn.cpp:210-244): per-window softmax(q k^T * scale + bias) v
where T is 49..196 tokens and the bias (rel-pos table) is shared by all
windows. On the XLA path the (NW*H, T, T) logits tensor round-trips HBM
three times (bias add, softmax, PV); here it never leaves VMEM.

Design notes (Mosaic constraints, see NOTES.md):
  * q/k/v stay in (NW, T, C) layout with per-head channels contiguous —
    no head transpose. Per-head logits are computed as
    dot(q * head_mask_h, k^T) contracting over ALL C lanes: zeroing the
    other heads' channels kills the cross terms, so the MXU sees a full
    C-wide contraction (C=128..320) instead of an hd=32 sliver.
  * One grid step processes G windows via fori_loop (dynamic first-axis
    ref indexing collapses to 8-aligned row offsets since Tp % 8 == 0);
    the per-head loop is a static unroll — 2*H dot sites total, well under
    the ~45-site Mosaic ceiling.
  * k is fed pre-transposed (NW, C, Tp) so the kernel needs no in-VMEM
    transpose (sublane<->lane relayouts are the known Mosaic tax).
  * Tokens are padded to Tp (multiple of 8); padded bias columns carry
    -1e9 so padded K/V tokens get zero softmax weight; padded q rows are
    zeros and their outputs are sliced off by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["window_attention"]


def _kernel(q_ref, kt_ref, v_ref, bias_ref, hmask_ref, o_ref, *, n_heads: int, g: int):
    def body(w, _):
        qw = q_ref[w]  # (Tp, C)
        ktw = kt_ref[w]  # (C, Tp)
        vw = v_ref[w]  # (Tp, C)
        acc = jnp.zeros(qw.shape, jnp.float32)
        for h in range(n_heads):
            m = hmask_ref[h]  # (C,)
            logits = jax.lax.dot_general(
                (qw * m).astype(qw.dtype), ktw,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Tp, Tp)
            logits = logits + bias_ref[h]
            mx = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - mx)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(vw.dtype), (vw * m).astype(vw.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Tp, C)
            acc = acc + pv
        o_ref[w] = acc.astype(o_ref.dtype)
        return _

    jax.lax.fori_loop(0, g, body, 0)


@functools.partial(jax.jit, static_argnames=("n_heads", "scale", "g", "interpret"))
def window_attention(q, k, v, bias, n_heads: int, scale: float, g: int = 8, interpret: bool = False):
    """Fused per-window attention.

    q, k, v: (NW, T, C) with per-head channels contiguous (C = n_heads*hd).
    bias: (n_heads, T, T) additive logits bias (f32), shared across windows.
    Returns (NW, T, C) in q's dtype.
    """
    from jax.experimental import pallas as pl

    nw, t, c = q.shape
    tp = -(-t // 8) * 8
    hd = c // n_heads

    # pad tokens to Tp; -1e9 bias on padded K columns
    if tp != t:
        q = jnp.pad(q, ((0, 0), (0, tp - t), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, tp - t), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, tp - t), (0, 0)))
        bias = jnp.pad(
            bias.astype(jnp.float32),
            ((0, 0), (0, tp - t), (0, tp - t)),
            constant_values=-1e9,
        )
        # padded ROWS (garbage queries) keep finite logits so no NaNs leak
        bias = bias.at[:, t:, :].set(0.0)
    bias = bias.astype(jnp.float32) * 1.0  # ensure f32 materialized

    # fold the scale into q once
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    kt = jnp.swapaxes(k, 1, 2)  # (NW, C, Tp)

    # pad the window count to a multiple of g
    wpad = (-nw) % g
    if wpad:
        q = jnp.pad(q, ((0, wpad), (0, 0), (0, 0)))
        kt = jnp.pad(kt, ((0, wpad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, wpad), (0, 0), (0, 0)))
    nwp = q.shape[0]

    hmask = np.zeros((n_heads, c), np.float32)
    for h in range(n_heads):
        hmask[h, h * hd : (h + 1) * hd] = 1.0
    hmask = jnp.asarray(hmask)

    out = pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, g=g),
        out_shape=jax.ShapeDtypeStruct((nwp, tp, c), q.dtype),
        grid=(nwp // g,),
        in_specs=[
            pl.BlockSpec((g, tp, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, c, tp), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, tp, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((n_heads, tp, tp), lambda i: (0, 0, 0)),
            pl.BlockSpec((n_heads, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g, tp, c), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(q, kt, v, bias, hmask)
    return out[:nw, :t]

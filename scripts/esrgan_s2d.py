#!/usr/bin/env python
"""Research artifact: row-pair space-to-depth ESRGAN trunk variant.

Exact same math as the production packed path (vision_tpu/models/esrgan.py)
with the RDB trunk on (H/2, W, 2C) activations — trades 4/3x FLOPs for full
MXU contraction fill. Measured slightly SLOWER than the packed path at
1024^2 on v5e (1329 vs 1279 ms, NOTES.md round 2): the x_j channel concats
at 32-lane boundaries eat the conv gains. Preserved here (out of the
production file) in case other shapes/hardware tilt the balance.

Usage: python scripts/esrgan_s2d.py  (runs a CPU parity check)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.core.params import Params
from vision_tpu.models.esrgan import (
    EsrganParams,
    _pack_impl,
    _tail_packed,
    _conv_p,
    esrgan_generate_packed,
    esrgan_pack_weights,
)


def esrgan_pack_weights_s2d(params: dict, p: EsrganParams, dtype=None):
    """Packed weights with the RDB packs additionally row-pair space-to-depth
    transformed and both row sub-position kernels merged along Cout:
    rdb_packs_s2d[j] has shape (n_blocks, 3, 2, 3, 2*Cin_j, 2*Cout_j) —
    ONE conv on a (1,1)-row-padded input computes both sub-positions;
    sub-position di is the rows[di:] view of its Cout block (see _rdb_s2d)."""
    w1 = params["model.1.sub.0.RDB1.conv1.0.weight"]
    gc, nf = int(w1.shape[0]), int(w1.shape[1])
    if dtype is None:
        dtype = w1.dtype
    arrays = dict(_pack_impl(params, p, jnp.dtype(dtype)))
    packs = arrays.pop("rdb_packs")
    arrays["rdb_packs_s2d"] = tuple(jax.vmap(jax.vmap(_s2d_kernel))(pk) for pk in packs)
    return {**arrays, "gc": gc, "nf": nf}


# ---------------------------------------------------------------------------
# Space-to-depth variant: trade 4/3 FLOPs for full MXU contraction fill
# ---------------------------------------------------------------------------
#
# Even split-contribution convs keep Cin=32 inputs, and (H, W, 32)
# activations fill only 32 of 128 lanes in TPU tiled layout (measured: Cin=32
# convs run at 19-39 TF/s, Cin>=128 at 74-130 TF/s). Folding PAIRS OF ROWS
# into channels makes every activation (H/2, W, 2C): a 3x3 conv becomes a
# (2,3) conv over 2*Cin channels emitting both row sub-positions — original
# tap u maps to (reduced tap a, sub-row s) with u = 2a + s - 1 + di for
# output sub-position di. Both di kernels merge along Cout into ONE conv on
# a (1,1)-row-padded input; sub-position di is the rows[di:di+H/2] view of
# its Cout block. Row views are FREE on TPU (H is not a tiled dim — W-axis
# variants were measured 45% slower due to sublane relayouts), so the only
# glue left is the channel concat assembling each x_j. FLOPs are 4/3x; the
# contraction K_eff goes from 9*32=288 at quarter-filled lanes to 6*64=384
# fully packed.


def _space_to_depth(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, h // 2, w, 2 * c)


def _depth_to_space(x):
    b, h, w, c2 = x.shape
    c = c2 // 2
    x = x.reshape(b, h, w, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, h * 2, w, c)


def _s2d_kernel(w_hwio):
    """(3,3,Cin,Cout) HWIO -> (2,3,2*Cin,2*Cout): row-pair space-to-depth,
    both output sub-positions merged along Cout ([di=0 | di=1] blocks)."""
    cin, cout = w_hwio.shape[2], w_hwio.shape[3]
    out_rows = []
    for a in (0, 1):
        blocks_per_di = []
        for di in (0, 1):
            sub = []
            for sy in (0, 1):
                u = 2 * a + sy - 1 + di
                sub.append(w_hwio[u] if 0 <= u <= 2 else jnp.zeros((3, cin, cout), w_hwio.dtype))
            blocks_per_di.append(jnp.concatenate(sub, axis=1))  # (3, 2Cin, Cout)
        out_rows.append(jnp.concatenate(blocks_per_di, axis=2))  # (3, 2Cin, 2Cout)
    return jnp.stack(out_rows)  # (2, 3, 2Cin, 2Cout)


def _rdb_s2d(xs, packs, biases, gc: int, nf: int):
    """One RDB on row-pair space-to-depth activations.
    packs[j]: (2, 3, 2*Cin_j, 2*Cout_j). Each merged conv output q has
    Hr+1 rows and channel blocks [di=0 | di=1]; ``view(q, di, lo, hi)``
    selects sub-position di's logical channels [lo:hi] at its alignment."""
    hr = xs.shape[1]

    def conv_m(src, w):
        srcp = jnp.pad(src, ((0, 0), (1, 1), (0, 0), (0, 0)))
        return jax.lax.conv_general_dilated(
            srcp, w, (1, 1), [(0, 0), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(src.dtype)

    def view(q, di, lo, hi):
        co = q.shape[-1] // 2
        return q[:, di : di + hr, :, di * co + lo : di * co + hi]

    lrelu = lambda t: jnp.where(t >= 0, t, 0.2 * t)
    b1, b2, b3, b4, b5 = (b.astype(xs.dtype) for b in biases)
    o = nf  # packs lead with the conv5 contribution (see pack_rdb)
    q0 = conv_m(xs, packs[0])
    x1 = jnp.concatenate([lrelu(view(q0, t, o, o + gc) + b1) for t in range(2)], axis=-1)
    q1 = conv_m(x1, packs[1])
    x2 = jnp.concatenate(
        [lrelu(view(q0, t, o + gc, o + 2 * gc) + view(q1, t, o, o + gc) + b2) for t in range(2)],
        axis=-1,
    )
    q2 = conv_m(x2, packs[2])
    x3 = jnp.concatenate(
        [
            lrelu(
                view(q0, t, o + 2 * gc, o + 3 * gc)
                + view(q1, t, o + gc, o + 2 * gc)
                + view(q2, t, o, o + gc)
                + b3
            )
            for t in range(2)
        ],
        axis=-1,
    )
    q3 = conv_m(x3, packs[3])
    x4 = jnp.concatenate(
        [
            lrelu(
                view(q0, t, o + 3 * gc, o + 4 * gc)
                + view(q1, t, o + 2 * gc, o + 3 * gc)
                + view(q2, t, o + gc, o + 2 * gc)
                + view(q3, t, o, o + gc)
                + b4
            )
            for t in range(2)
        ],
        axis=-1,
    )
    q4 = conv_m(x4, packs[4])
    x5 = jnp.concatenate(
        [
            view(q0, t, 0, o)
            + view(q1, t, 0, o)
            + view(q2, t, 0, o)
            + view(q3, t, 0, o)
            + view(q4, t, 0, o)
            + b5
            for t in range(2)
        ],
        axis=-1,
    )
    return xs + 0.2 * x5


def esrgan_generate_s2d(packed: dict, x, p: EsrganParams):
    """RRDBNet forward with the trunk on row-pair space-to-depth
    activations. Requires even H (whole-image TPU path); exact same math."""
    gc, nf = packed["gc"], packed["nf"]
    x = _conv_p(x, packed["stem"])
    xs = _space_to_depth(x)

    def rrdb_body(carry, wb):
        packs, biases = wb
        y = carry
        for r in range(3):
            y = _rdb_s2d(y, [pk[r] for pk in packs], [b[r] for b in biases], gc, nf)
        return carry + 0.2 * y, None

    xs, _ = jax.lax.scan(rrdb_body, xs, (packed["rdb_packs_s2d"], packed["rdb_biases"]))
    sub = _depth_to_space(xs)
    sub = _conv_p(sub, packed["trunk"])
    x = x + sub
    return _tail_packed(packed, x)



if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    from vision_tpu.models.random_weights import random_esrgan_params

    p = EsrganParams(4, 2)
    raw = {k: jnp.asarray(v) for k, v in random_esrgan_params(0, nf=16, nb=2, gc=8).items()}
    x = jnp.asarray(np.random.default_rng(0).random((1, 24, 24, 3)), jnp.float32)
    pk = esrgan_pack_weights(raw, p)
    pk_s2d = esrgan_pack_weights_s2d(raw, p)
    a = esrgan_generate_packed(pk, x, p)
    b = esrgan_generate_s2d(pk_s2d, x, p)
    d = float(jnp.abs(a - b).max())
    print(f"s2d vs packed max|delta| = {d:.2e}")
    assert d < 1e-4
    print("OK")

#!/usr/bin/env python
"""ESRGAN upsample-tail variants (PLAN.md round-3 item 2).

The tail after the trunk is: 2x (nearest-up 2x + 3x3 conv 64->64 + lrelu),
then hr conv 3x3 64->64 + lrelu, then last conv 3x3 64->3 — all at 2048^2 /
4096^2 where 64-channel convs measure ~26 TF/s.

Exact rewrite: nearest-up 2x followed by a zero-padded 3x3 conv equals a
3x3 conv AT LOW RES with 4*Cout channels followed by depth-to-space. For
output sub-row di and kernel row u (offset u-1), the sampled source block
row is i + floor((di+u-1)/2):
    di=0: u=0 -> row -1 (w0);  u=1,2 -> row 0 (w1+w2)
    di=1: u=0,1 -> row 0 (w0+w1); u=2 -> row +1 (w2)
so the effective low-res kernel is W_sub[r, s, :, (di,dj,:)] =
sum_{u->r, v->s} w[u, v] with the row/col index maps above. Zero padding of
the upsampled image corresponds exactly to zero padding at low res.

Usage: python scripts/exp_tail.py [cpu-check|tpu]
"""
import os, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "cpu-check"
if mode == "cpu-check":
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp


def conv(src, w, b=None):
    y = jax.lax.conv_general_dilated(
        src, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    return y.astype(src.dtype)


def lrelu(t):
    return jnp.where(t >= 0, t, 0.2 * t)


def nearest2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


# --- subpixel transform -----------------------------------------------------

_M0 = np.array([[1, 0, 0], [0, 1, 1], [0, 0, 0]], np.float32)  # di=0: ry x u
_M1 = np.array([[0, 0, 0], [1, 1, 0], [0, 0, 1]], np.float32)  # di=1


def subpixel_kernel(w_hwio):
    """(3,3,Cin,Cout) -> (3,3,Cin,4*Cout); channel order (di, dj, cout)."""
    M = jnp.asarray(np.stack([_M0, _M1]))  # (2, 3, 3)
    # out[r, s, i, di, dj, o] = sum_{u,v} M[di, r, u] M[dj, s, v] w[u, v, i, o]
    k = jnp.einsum("dru,esv,uvio->rsideo", M, M, w_hwio.astype(jnp.float32))
    r, s, cin = k.shape[0], k.shape[1], k.shape[2]
    return k.reshape(r, s, cin, -1).astype(w_hwio.dtype)


def depth_to_space2(x, cout):
    n, h, w, c4 = x.shape
    x = x.reshape(n, h, w, 2, 2, cout)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, 2 * h, 2 * w, cout)


def up_subpixel(x, w, b, cout):
    y = conv(x, subpixel_kernel(w), jnp.tile(b, 4))
    return depth_to_space2(lrelu(y), cout)


def up_naive(x, w, b):
    return lrelu(conv(nearest2x(x), w, b))


# --- block-domain conv: logical 3x3 conv at 2R expressed on the b=2 block
# tensor (R, R, 4C). For output sub-row di and kernel row u, the logical row
# offset t = di+u-1 decomposes as t = 2*ry + s (s in {0,1}), so
# W_blk[ry, rx, (s, sx, ci), (di, dj, co)] = w[u, v, ci, co] with
# u = 2*ry + s - di + 1 when 0 <= u <= 2, else 0. Zero padding at block
# granularity reproduces the logical zero padding exactly. ----------------


def block_kernel(w_hwio):
    """(3,3,Cin,Cout) -> (3,3,4*Cin,4*Cout) for block-in/block-out conv.
    Channel order (s, sx, ci) in, (di, dj, co) out — matching
    depth_to_space2's (2, 2, C) reshape."""
    cin, cout = w_hwio.shape[2], w_hwio.shape[3]
    w = np.zeros((3, 3, 2, 2, cin, 2, 2, cout), np.float32)
    wf = np.asarray(w_hwio, np.float32)
    for di in (0, 1):
        for s in (0, 1):
            for ry in (-1, 0, 1):
                u = 2 * ry + s - di + 1
                if 0 <= u <= 2:
                    for dj in (0, 1):
                        for sx in (0, 1):
                            for rx in (-1, 0, 1):
                                v = 2 * rx + sx - dj + 1
                                if 0 <= v <= 2:
                                    w[ry + 1, rx + 1, s, sx, :, di, dj, :] += wf[u, v]
    return jnp.asarray(w.reshape(3, 3, 4 * cin, 4 * cout), w_hwio.dtype)


def space_to_block(x):  # (N, 2H, 2W, C) -> (N, H, W, 4C), channel (s, sx, c)
    n, h2, w2, c = x.shape
    x = x.reshape(n, h2 // 2, 2, w2 // 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(n, h2 // 2, w2 // 2, 4 * c)


# --- correctness ------------------------------------------------------------

if mode == "cpu-check":
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 17, 13, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 6)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((6,)) * 0.1, jnp.float32)
    ref = up_naive(x, w, b)
    got = up_subpixel(x, w, b, 6)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"subpixel vs nearest-up+conv max|d| = {err:.3e}  shapes {ref.shape} {got.shape}")
    assert err < 1e-5

    # block-domain conv: conv3x3 at 2R == block conv on the (R, R, 4C) tensor
    xb = jnp.asarray(rng.standard_normal((2, 12, 10, 5)), jnp.float32)
    wb_ = jnp.asarray(rng.standard_normal((3, 3, 5, 7)) * 0.2, jnp.float32)
    ref2 = conv(xb, wb_)
    got2 = depth_to_space2(conv(space_to_block(xb), block_kernel(wb_)), 7)
    err2 = float(jnp.max(jnp.abs(ref2 - got2)))
    print(f"block conv vs direct max|d| = {err2:.3e}  shapes {ref2.shape} {got2.shape}")
    assert err2 < 1e-5
    print("OK")
    sys.exit(0)

# --- timing on the live device ----------------------------------------------

dtype = jnp.bfloat16
_keys = jax.random.split(jax.random.PRNGKey(0), 8)


def dev_normal(key, shape, scale):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


x0 = jax.jit(dev_normal, static_argnums=(1, 2))(_keys[0], (1, 1024, 1024, 64), 0.2)
wu1 = dev_normal(_keys[1], (3, 3, 64, 64), 0.05)
wu2 = dev_normal(_keys[2], (3, 3, 64, 64), 0.05)
whr = dev_normal(_keys[3], (3, 3, 64, 64), 0.05)
wlast = dev_normal(_keys[4], (3, 3, 64, 3), 0.05)
b64 = jnp.zeros((64,), jnp.float32)
b3 = jnp.zeros((3,), jnp.float32)


def tail_naive(x):
    x = up_naive(x, wu1, b64)
    x = up_naive(x, wu2, b64)
    x = lrelu(conv(x, whr, b64))
    return conv(x, wlast, b3)


def tail_subpixel(x):
    x = up_subpixel(x, wu1, b64, 64)
    x = up_subpixel(x, wu2, b64, 64)
    x = lrelu(conv(x, whr, b64))
    return conv(x, wlast, b3)


def tail_block(x):
    """Whole tail with 4096^2 work held in the 2048^2 block domain:
    up1 subpixel -> 2048^2 x 64; up2 subpixel WITHOUT d2s -> 2048^2 x 256
    blocks; hr and last as block-domain convs (4x FLOPs at full lane fill vs
    quarter-fill at 4096^2); one final d2s on the 3-channel output."""
    x = up_subpixel(x, wu1, b64, 64)  # 2048^2 x 64
    y = lrelu(conv(x, subpixel_kernel(wu2), jnp.tile(b64, 4)))  # blocks of up2
    y = lrelu(conv(y, block_kernel(whr), jnp.tile(b64, 4)))  # blocks of hr
    y = conv(y, block_kernel(wlast), jnp.tile(b3, 4))  # blocks of last
    return depth_to_space2(y, 3)


def tail_subpixel_fused_hr(x):
    """hr conv folded before the second depth-to-space: dense subpixel conv
    at 2048^2 over 256 -> 256 channels (4x FLOPs but full lane fill)."""
    x = up_subpixel(x, wu1, b64, 64)
    y = conv(x, subpixel_kernel(wu2), jnp.tile(b64, 4))
    y = lrelu(y)  # 2048^2 x 256, block layout of the 4096^2 up2 output
    # hr conv in block domain: kernel taps reach block offsets in {-1,0,1}
    # with sub-position bookkeeping — build by brute force composition:
    # treat hr as conv at high res == subpixel transform of hr applied to
    # the block tensor with channel groups permuted per sub-position.
    # For exactness here, just d2s then conv (fused variant measured via
    # tail_subpixel); this variant only fuses lrelu placement.
    y = depth_to_space2(y, 64)
    y = lrelu(conv(y, whr, b64))
    return conv(y, wlast, b3)


def stage_times():
    """Per-stage loop timings."""
    x1 = x0
    x2048 = jax.jit(dev_normal, static_argnums=(1, 2))(_keys[5], (1, 2048, 2048, 64), 0.2)
    x4096 = jax.jit(dev_normal, static_argnums=(1, 2))(_keys[6], (1, 4096, 4096, 64), 0.2)
    xblk = jax.jit(dev_normal, static_argnums=(1, 2))(_keys[7], (1, 2048, 2048, 256), 0.2)
    stages = {
        "hr_block@2048": (lambda t: lrelu(conv(t, block_kernel(whr), jnp.tile(b64, 4))), xblk),
        "last_block@2048": (lambda t: conv(t, block_kernel(wlast), jnp.tile(b3, 4)), xblk),
    }
    for name, (fn, xx) in stages.items():
        print(f"{name}: {timeit(fn, xx)*1000:7.2f} ms", flush=True)


def timeit(fn, x, K=8):
    @partial(jax.jit, static_argnames=("kk",))
    def run(x, kk):
        def body(i, acc):
            xi = (x.astype(jnp.float32) + acc * 0).astype(x.dtype)
            return acc + jnp.sum(fn(xi).astype(jnp.float32))
        return jax.lax.fori_loop(0, kk, body, 0.0)

    float(run(x, K)); float(run(x, 1))
    def best(kk, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); float(run(x, kk)); ts.append(time.perf_counter() - t0)
        return min(ts)
    return (best(K) - best(1)) / (K - 1)


print("device:", jax.devices()[0], flush=True)
stage_times()
for name, fn in (("tail_block", tail_block), ("tail_naive", tail_naive)):
    print(f"{name}: {timeit(fn, x0)*1000:7.2f} ms", flush=True)

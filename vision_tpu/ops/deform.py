"""Deformable convolution v2 (offset + modulation mask).

Re-provides the reference's fork-only `ggml_conv_2d_deform` (used by
BiRefNet's deformable ASPP, src/visp/nn.cpp:131-148, birefnet.cpp:83-91) —
SURVEY.md's "hard part #1": there is no lax primitive for it.

Semantics follow torchvision.ops.deform_conv2d (what BiRefNet trains with):
for each output position p0 and kernel tap k, sample the input bilinearly at
``p0*stride - pad + k + offset_k``, scale by the modulation mask, then apply
the conv weight. Offsets are per-output-pixel (y, x) pairs laid out
[2*K*K] with tap-major (dy0, dx0, dy1, dx1, ...); out-of-bounds samples are
zero.

TPU-first formulation: one flat gather per (tap, corner) — 4*K*K gathers of
the (B, H*W, C) map via `jnp.take_along_axis` — followed by K*K channel
matmuls that run on the MXU. Gathers are the unavoidable data-dependent
part; everything else stays dense. K is static so the loop unrolls at trace
time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["deform_conv_2d", "deform_conv_2d_shift"]


def _gather_pixels(x_flat, iy, ix, w, h):
    """Bilinear-corner gather with zero padding outside.

    x_flat: (B, H*W, C); iy/ix: (B, Ho, Wo) int32 (may be out of range).
    Returns (B, Ho, Wo, C)."""
    b, hw, c = x_flat.shape
    inb = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iyc = jnp.clip(iy, 0, h - 1)
    ixc = jnp.clip(ix, 0, w - 1)
    idx = (iyc * w + ixc).reshape(b, -1, 1)  # (B, Ho*Wo, 1)
    g = jnp.take_along_axis(x_flat, idx, axis=1)  # (B, Ho*Wo, C)
    g = g.reshape(b, iy.shape[1], iy.shape[2], c)
    return g * inb[..., None].astype(g.dtype)


def deform_conv_2d_shift(x, weight, offset, mask=None, stride: int = 1, pad: int = 0, bound: int = 4):
    """Gather-free deformable conv v2 with offsets bounded to [-bound, bound].

    XLA row-gathers are the BiRefNet decoder's bottleneck on TPU (~92 GB/s
    effective; NOTES.md round-1 breakdown). This formulation replaces every
    bilinear gather with a dense sum of statically-shifted windows: for tap k
    the sample at ``p + k + off`` expands to

        s_k(p) = sum_{dy,dx in [-B, B]} relu(1-|off_y-dy|) * relu(1-|off_x-dx|)
                 * x[p + k + (dy, dx)]

    because the bilinear tent weight for integer shift d is exactly
    ``relu(1 - |off - d|)`` — at most two consecutive shifts are non-zero, so
    the dense sum reproduces bilinear interpolation EXACTLY whenever
    |off| <= bound (with off clamped to [-B, B] the shift d = B+1 always has
    tent weight relu(1 - |off - (B+1)|) = 0, so (2B+1)^2 windows suffice).
    Offsets are clamped to the bound (the only divergence from torchvision
    semantics; trained BiRefNet offsets are small). Every term is a static
    slice of the zero-padded input — pure VPU multiply-adds, no gathers,
    out-of-image samples zero by construction.

    Offsets and mask are consumed in tap-major layout internally: per-tap
    reads of the (..., 2*K*K) tensor are 1-wide lane slices (sub-128 lane
    offsets relayout on TPU), so the whole tensor is transposed once up
    front and each tap reads a free leading-axis plane.
    """
    b, h, w, cin = x.shape
    cout, cin_w, kh, kw = weight.shape
    assert cin_w == cin
    ho, wo = offset.shape[1], offset.shape[2]
    f32 = jnp.float32
    # window multiplies run in the INPUT dtype (bf16 on TPU: measured 1.52x
    # over all-f32 — 16.6 -> 10.9 ms for the k=7 module, exp_deform3.py);
    # sums accumulate in f32. On the f32 CPU parity path this is identical
    # to full-f32 arithmetic.
    mul_dt = x.dtype
    # (B, Ho, Wo, 2KK) -> (2KK, B, Ho, Wo): tap reads become leading-axis
    off = jnp.clip(jnp.transpose(offset, (3, 0, 1, 2)).astype(f32), -bound, bound)
    mask_t = None if mask is None else jnp.transpose(mask, (3, 0, 1, 2)).astype(f32)

    pw = pad + bound
    xp = jnp.pad(x, ((0, 0), (pw, pw), (pw, pw), (0, 0)))

    out = jnp.zeros((b, ho, wo, cout), f32)
    for k in range(kh * kw):
        ky, kx = divmod(k, kw)
        offy = off[2 * k][..., None]  # (B, Ho, Wo, 1)
        offx = off[2 * k + 1][..., None]
        acc = jnp.zeros((b, ho, wo, cin), f32)
        for dy in range(-bound, bound + 1):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(offy - dy)).astype(mul_dt)
            r0 = pw - pad + ky + dy
            rows = jax.lax.slice(
                xp, (0, r0, 0, 0), (b, r0 + (ho - 1) * stride + 1, xp.shape[2], cin),
                (1, stride, 1, 1),
            )
            inner = jnp.zeros((b, ho, wo, cin), f32)
            for dx in range(-bound, bound + 1):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(offx - dx)).astype(mul_dt)
                c0 = pw - pad + kx + dx
                win = jax.lax.slice(
                    rows, (0, 0, c0, 0), (b, ho, c0 + (wo - 1) * stride + 1, cin),
                    (1, 1, stride, 1),
                )
                inner = inner + (win * wx).astype(f32)
            acc = acc + inner * wy.astype(f32)
        if mask_t is not None:
            acc = acc * mask_t[k][..., None]
        wk = weight[:, :, ky, kx].astype(mul_dt)  # (Cout, Cin)
        out = out + jnp.matmul(acc.astype(mul_dt), wk.T, preferred_element_type=f32)
    return out.astype(x.dtype)


def deform_conv_2d(x, weight, offset, mask=None, stride: int = 1, pad: int = 0):
    """Deformable conv v2.

    x:      (B, H, W, Cin)   NHWC input
    weight: (Cout, Cin, kH, kW)  torch-canonical kernel
    offset: (B, Ho, Wo, 2*kH*kW) per-pixel (dy, dx) pairs, tap-major
    mask:   (B, Ho, Wo, kH*kW) modulation (already sigmoid*2 scaled) or None
    Returns (B, Ho, Wo, Cout).
    """
    b, h, w, cin = x.shape
    cout, cin_w, kh, kw = weight.shape
    assert cin_w == cin
    ho, wo = offset.shape[1], offset.shape[2]

    f32 = jnp.float32
    x_flat = x.reshape(b, h * w, cin)
    off = offset.astype(f32)

    # static base grid of output positions
    oy = (np.arange(ho) * stride - pad).reshape(1, ho, 1)
    ox = (np.arange(wo) * stride - pad).reshape(1, 1, wo)

    out = jnp.zeros((b, ho, wo, cout), f32)
    for k in range(kh * kw):
        ky, kx = divmod(k, kw)
        dy = off[..., 2 * k]
        dx = off[..., 2 * k + 1]
        py = jnp.asarray(oy + ky, f32) + dy  # (B, Ho, Wo)
        px = jnp.asarray(ox + kx, f32) + dx
        y0 = jnp.floor(py).astype(jnp.int32)
        x0 = jnp.floor(px).astype(jnp.int32)
        fy = py - y0
        fx = px - x0
        # 4-corner bilinear blend
        s = (
            _gather_pixels(x_flat, y0, x0, w, h) * ((1 - fy) * (1 - fx))[..., None]
            + _gather_pixels(x_flat, y0, x0 + 1, w, h) * ((1 - fy) * fx)[..., None]
            + _gather_pixels(x_flat, y0 + 1, x0, w, h) * (fy * (1 - fx))[..., None]
            + _gather_pixels(x_flat, y0 + 1, x0 + 1, w, h) * (fy * fx)[..., None]
        )
        if mask is not None:
            s = s * mask[..., k, None].astype(s.dtype)
        wk = weight[:, :, ky, kx].astype(f32)  # (Cout, Cin)
        out = out + jnp.matmul(s.astype(f32), wk.T, preferred_element_type=f32)
    return out.astype(x.dtype)

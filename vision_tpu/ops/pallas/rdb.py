"""Pallas fused residual-dense-block kernel for ESRGAN's RRDBNet.

STATUS: EXPERIMENTAL — numerically correct (bf16-level agreement with the
XLA chain) but measured 246 ms/RDB at 1024^2 tile=32 vs 31 ms for the XLA
conv chain on v5e: the per-tap `pl.ds` row-shifted reads force a Mosaic
relayout per dot and the tile sizes that fit VMEM keep the MXU underfed.
Kept as the starting point for the round-2 rewrite (see PLAN.md item 2 and
the Mosaic lowering constraints in NOTES.md). Production ESRGAN uses the
XLA path (models/esrgan.py).

The RDB (reference esrgan.cpp:27-41) is 5 chained 3x3 convs with dense
channel concats and 32-wide growth channels. XLA lowers each conv
separately and reaches only ~4 TF/s at 1024^2 (see NOTES.md) — the chain
re-tiles and round-trips HBM per conv, and N=32 underfills MXU lanes.

This kernel computes the ENTIRE block per spatial tile in VMEM:

  * the input tile (T+16)^2 x C is DMA'd once from HBM (logical halo is 5 —
    one ring per conv — padded to 8 for TPU sublane alignment of the DMA
    slice); intermediates x1..x4 live in VMEM scratch and never touch HBM.
  * each conv runs its 9 taps in a fori_loop of shifted (M, K) @ (K, N)
    MXU dots read through `pl.ds` ref windows (full unrolling OOMs the
    Mosaic compiler; value-level dynamic_slice is unsupported).
  * the dense concats become per-source weight splits; bias + leaky-relu
    fused; out-of-image intermediates are masked to zero to match the true
    chain's per-conv zero padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["rdb_fused", "rdb_weights_from_params", "HALO"]

HALO = 8  # DMA-aligned halo (logical need is 5: one ring per conv)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def rdb_fused(x, weights, tile: int = 64, interpret: bool = False):
    """Fused residual dense block: x + 0.2 * conv5(dense chain).

    x: (B, H, W, C) with H, W divisible by `tile`; weights: tuple of 5
    (hwio_weight, f32_bias) pairs from rdb_weights_from_params."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    assert h % tile == 0 and w % tile == 0, (h, w, tile)
    # HBM DMA slices require 128-aligned channel extents: pad nf (64) to 128.
    c_pad = max(128, ((c + 127) // 128) * 128)
    (w1, b1), (w2, b2), (w3, b3), (w4, b4), (w5, b5) = weights
    gc = w1.shape[-1]  # growth channels

    def pad_x_rows(wk):
        head, tail = wk[:, :, :c, :], wk[:, :, c:, :]
        if c_pad == c:
            return wk
        return jnp.concatenate(
            [jnp.pad(head, ((0, 0), (0, 0), (0, c_pad - c), (0, 0))), tail], axis=2
        )

    w1, w2, w3, w4, w5 = (pad_x_rows(wk) for wk in (w1, w2, w3, w4, w5))
    if c_pad != c:
        # pad conv5 OUTPUT to c_pad too (fills otherwise-idle MXU lanes)
        w5 = jnp.pad(w5, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
        b5 = jnp.pad(b5, (0, c_pad - c))
        x_in = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
    else:
        x_in = x
    xp = jnp.pad(x_in, ((0, 0), (HALO, HALO), (HALO, HALO), (0, 0)))
    win = tile + 2 * HALO

    def kernel(
        x_hbm, w1r, b1r, w2r, b2r, w3r, b3r, w4r, b4r, w5r, b5r,
        o_ref, x_vmem, s1, s2, s3, s4, sem,
    ):
        bi = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        dma = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(i * tile, win), pl.ds(j * tile, win), :],
            x_vmem,
            sem,
        )
        dma.start()
        dma.wait()

        def conv(srcs, w_ref, b_ref, out_hw, level, act, out_ref=None):
            """srcs: list of (ref, extent, channels, col_offset_in_w)."""
            out_h = out_w = out_hw
            cout = w_ref.shape[-1]
            acc = jnp.zeros((out_h * out_w, cout), jnp.float32)
            for src_ref, ext, cs, coff in srcs:
                mh = (ext - (out_h + 2)) // 2

                def body(dy, acc, src_ref=src_ref, cs=cs, coff=coff, mh=mh):
                    # dynamic offsets are only allowed on the H (row) axis;
                    # the W (sublane) axis must be statically sliced, so dx
                    # is unrolled (3 static slices)
                    for dx in range(3):
                        patch = src_ref[pl.ds(mh + dy, out_h), mh + dx : mh + dx + out_w, :cs]
                        m = patch.reshape(out_h * out_w, cs)
                        wk = w_ref[dy, dx, pl.ds(coff, cs), :]
                        acc = acc + jax.lax.dot_general(
                            m, wk,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    return acc

                acc = jax.lax.fori_loop(0, 3, body, acc)
            acc = acc + b_ref[...].astype(jnp.float32)
            if act:
                acc = jnp.where(acc >= 0, acc, 0.2 * acc)
            out = acc.reshape(out_h, out_w, cout)
            if level is not None:
                # zero out-of-image values (the true chain zero-pads each
                # conv at the IMAGE boundary; the fused chain would compute
                # lrelu(bias) there)
                m = HALO - level
                rows = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1)
                ok = (
                    (rows + i * tile - m >= 0)
                    & (rows + i * tile - m < h)
                    & (cols + j * tile - m >= 0)
                    & (cols + j * tile - m < w)
                )
                out = out * ok.astype(jnp.float32)[..., None]
            return out

        x_src = (x_vmem, win, c_pad, 0)
        o1 = conv([x_src], w1r, b1r, win - 2, 1, True)
        s1[...] = o1.astype(s1.dtype)
        o2 = conv([x_src, (s1, win - 2, gc, c_pad)], w2r, b2r, win - 4, 2, True)
        s2[...] = o2.astype(s2.dtype)
        o3 = conv(
            [x_src, (s1, win - 2, gc, c_pad), (s2, win - 4, gc, c_pad + gc)],
            w3r, b3r, win - 6, 3, True,
        )
        s3[...] = o3.astype(s3.dtype)
        o4 = conv(
            [x_src, (s1, win - 2, gc, c_pad), (s2, win - 4, gc, c_pad + gc),
             (s3, win - 6, gc, c_pad + 2 * gc)],
            w4r, b4r, win - 8, 4, True,
        )
        s4[...] = o4.astype(s4.dtype)
        x5 = conv(
            [x_src, (s1, win - 2, gc, c_pad), (s2, win - 4, gc, c_pad + gc),
             (s3, win - 6, gc, c_pad + 2 * gc), (s4, win - 8, gc, c_pad + 3 * gc)],
            w5r, b5r, win - 10, None, False,
        )
        m5 = HALO - 5
        x5c = x5[m5 : m5 + tile, m5 : m5 + tile, :]
        center = x_vmem[HALO : HALO + tile, HALO : HALO + tile, :]
        o_ref[0] = (center.astype(jnp.float32) + 0.2 * x5c).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_pad), x.dtype),
        grid=(b, h // tile, w // tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(10)],
        out_specs=pl.BlockSpec((1, tile, tile, c_pad), lambda bi, i, j: (bi, i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((win, win, c_pad), x.dtype),
            pltpu.VMEM((win - 2, win - 2, gc), x.dtype),
            pltpu.VMEM((win - 4, win - 4, gc), x.dtype),
            pltpu.VMEM((win - 6, win - 6, gc), x.dtype),
            pltpu.VMEM((win - 8, win - 8, gc), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5)
    return out[..., :c] if c_pad != c else out


def rdb_weights_from_params(p, dtype=jnp.bfloat16):
    """(hwio_weight, f32_bias) pairs for conv1..conv5 from a Params view at
    the RDB (torch-canonical (O, I, 3, 3) storage, names convN.0)."""
    out = []
    for name in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        w = p[name][0].weight("weight")
        bias = p[name][0].weight("bias")
        out.append((jnp.transpose(w, (2, 3, 1, 0)).astype(dtype), bias.astype(jnp.float32)))
    return tuple(out)

"""Real-ESRGAN super-resolution (RRDBNet).

TPU-native re-design of the reference implementation
(src/visp/arch/esrgan.{cpp,h}, tiled pipeline in src/visp/vision.cpp:205-253):

  * graph builder `esrgan_generate` mirrors esrgan.cpp:55-83 — conv stem,
    n_blocks x RRDB (3x residual-dense-blocks of 5 convs with dense channel
    concats, 0.2 residual scaling, esrgan.cpp:27-51), trunk conv + skip,
    log2(scale) x (nearest 2x upsample + conv + lrelu, esrgan.cpp:13-19),
    2 final convs. Weight names are the GGUF/torch "old-arch" names
    (`model.0`, `model.1.sub.N.RDBk.convj.0`, ...), addressed through Params.
  * tiled inference (reference: sequential per-tile H2D/compute/D2H loop,
    vision.cpp:240-251) becomes **batched tiles in one jitted program**:
    all tiles are stacked on the batch axis and executed in fixed-size
    chunks, so the MXU sees large batched convs and each request crosses
    the host<->device boundary once per chunk instead of 3x per tile.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.device import Device, backend_init
from ..core.errors import raise_error
from ..core.gguf import GGUFFile, model_load
from ..core.params import Params
from ..core.weights import load_weights
from ..image import (
    Image,
    ImageFormat,
    TileLayout,
    image_alloc,
    image_f32_to_u8,
    tile_scale,
    tile_weights,
)
from ..ops import conv_2d, leaky_relu, resize_nhwc

__all__ = [
    "EsrganParams",
    "esrgan_detect_params",
    "esrgan_generate",
    "esrgan_pack_weights",
    "esrgan_generate_packed",
    "EsrganModel",
    "esrgan_load_model",
    "esrgan_compute",
]

ESRGAN_DEFAULT_TILE_SIZE = 224
ESRGAN_TILE_OVERLAP = 16


@dataclass(frozen=True)
class EsrganParams:
    scale: int = 4
    n_blocks: int = 23


def esrgan_detect_params(file: GGUFFile) -> EsrganParams:
    """Reference esrgan_detect_params (esrgan.cpp:85-96)."""
    if file.arch != "esrgan":
        raise_error("Architecture expected to be 'esrgan', but was '{}' ({})", file.arch, file.path)
    scale = file.get_int("esrgan.scale")
    n_blocks = file.get_int("esrgan.block_count")
    if not (1 <= scale <= 8):
        raise_error("ESRGAN: unsupported scale: {}", scale)
    if not (1 <= n_blocks <= 23):
        raise_error("ESRGAN: invalid number of blocks: {}", n_blocks)
    return EsrganParams(scale, n_blocks)


def _conv_block(p: Params, x):
    """conv 3x3 + leaky relu 0.2 (reference esrgan.cpp:21-25)."""
    return leaky_relu(conv_2d(p[0], x, 1, 1), 0.2)


def residual_dense_block(p: Params, x):
    """5-conv dense block, 0.2 residual (reference esrgan.cpp:27-41).

    (A split-weight no-concat variant was measured identical in device time
    at 4x the compile cost — the bottleneck is the 32-wide growth-channel
    outputs underfilling MXU lanes, not the concat materialization.)"""
    x1 = _conv_block(p["conv1"], x)
    c1 = jnp.concatenate([x, x1], axis=-1)
    x2 = _conv_block(p["conv2"], c1)
    c2 = jnp.concatenate([c1, x2], axis=-1)
    x3 = _conv_block(p["conv3"], c2)
    c3 = jnp.concatenate([c2, x3], axis=-1)
    x4 = _conv_block(p["conv4"], c3)
    c4 = jnp.concatenate([c3, x4], axis=-1)
    x5 = conv_2d(p["conv5"][0], c4, 1, 1)
    return x + 0.2 * x5


def rrdb(p: Params, x):
    """Residual-in-residual dense block (reference esrgan.cpp:43-51)."""
    y = residual_dense_block(p["RDB1"], x)
    y = residual_dense_block(p["RDB2"], y)
    y = residual_dense_block(p["RDB3"], y)
    return x + 0.2 * y


def _upsample(p: Params, x):
    """nearest 2x + conv + lrelu (reference esrgan.cpp:13-19)."""
    n, h, w, c = x.shape
    x = resize_nhwc(x, (h * 2, w * 2), "nearest")
    x = conv_2d(p, x, 1, 1)
    return leaky_relu(x, 0.2)


def esrgan_generate(params: Params, x, p: EsrganParams):
    """RRDBNet forward, NHWC (reference esrgan_generate, esrgan.cpp:55-83).
    x: (N, H, W, 3) in [0,1] -> (N, H*scale, W*scale, 3)."""
    m = params["model"]
    x = conv_2d(m[0], x, 1, 1)
    sub = x
    block = m[1]["sub"]
    for i in range(p.n_blocks):
        sub = rrdb(block[i], sub)
    sub = conv_2d(block[p.n_blocks], sub, 1, 1)
    x = x + sub
    seq = 2
    for _ in range(int(np.log2(p.scale))):
        x = _upsample(m[seq + 1], x)
        seq += 3
    x = conv_2d(m[seq], x, 1, 1)
    x = leaky_relu(x, 0.2)
    x = conv_2d(m[seq + 2], x, 1, 1)
    return x


# ---------------------------------------------------------------------------
# MXU-shaped fast path: split-contribution RDB + lax.scan trunk
# ---------------------------------------------------------------------------
#
# The naive RDB chain (esrgan.cpp:27-41) is 5 convs whose OUTPUT width is the
# growth channel count gc=32 — only a quarter of the MXU's 128 lanes. The
# restructure below is *exactly* the same math with the contraction split by
# SOURCE instead of by destination: every conv_k weight is a concat over its
# input sources [x, x1..x_{k-1}], so grouping all contributions that read the
# same source into ONE conv turns the five (Cin_k -> 32) convs into
#   x  -> 4*gc+nf = 192 channels   (pack 0)
#   x1 -> 3*gc+nf = 160            (pack 1)
#   x2 -> 2*gc+nf = 128            (pack 2)
#   x3 ->   gc+nf =  96            (pack 3)
#   x4 ->      nf =  64            (pack 4)
# FLOPs are identical; the MXU lane fill goes from 25% to 75-150%, the dense
# concats vanish, and the sequential dependency chain stays 5 deep.
#
# The 23 identical RRDBs then run under ONE lax.scan over stacked weights,
# which cuts the 345-conv trace/compile (~75 s remote) to a single block body.


def _hwio(w):
    return jnp.transpose(w, (2, 3, 1, 0))


def esrgan_pack_weights(params: dict, p: EsrganParams, dtype=None):
    """Repack torch-canonical RRDBNet weights into the split-contribution
    layout. Returns a pytree: stacked RDB packs for the scan trunk plus the
    stem/trunk/upsample convs in HWIO. Pure one-time data movement, executed
    as ONE jitted program (eagerly it would be thousands of tiny dispatches —
    ~80 s over the dev tunnel)."""
    w1 = params["model.1.sub.0.RDB1.conv1.0.weight"]
    gc, nf = int(w1.shape[0]), int(w1.shape[1])
    if dtype is None:
        dtype = w1.dtype
    arrays = _pack_impl(params, p, jnp.dtype(dtype))
    return {**arrays, "gc": gc, "nf": nf}


@partial(jax.jit, static_argnums=(1, 2))
def _pack_impl(params: dict, p: EsrganParams, dtype):
    root = Params(params)
    m = root["model"]
    w1 = m[1]["sub"][0]["RDB1"]["conv1"][0].weight("weight")
    gc, nf = int(w1.shape[0]), int(w1.shape[1])

    def pack_rdb(rp: Params):
        ws = [rp[f"conv{k}"][0].weight("weight") for k in range(1, 6)]
        bs = [rp[f"conv{k}"][0].weight("bias").astype(jnp.float32) for k in range(1, 6)]
        packs = []
        for j in range(5):  # source 0 = x, 1..4 = x_j
            lo = 0 if j == 0 else nf + gc * (j - 1)
            width = nf if j == 0 else gc
            # source j feeds conv_{j+1}..conv_5 (ws indices j..4); the
            # conv5 contribution is ordered FIRST so the x5 tail sum reads
            # every pack at lane offset 0 (a 128-aligned tile boundary —
            # sub-128 lane offsets force relayouts on TPU)
            parts = [ws[4][:, lo : lo + width]] + [ws[k][:, lo : lo + width] for k in range(j, 4)]
            packs.append(_hwio(jnp.concatenate(parts, axis=0)).astype(dtype))
        return packs, bs

    n_rdb = []
    for i in range(p.n_blocks):
        for r in (1, 2, 3):
            n_rdb.append(pack_rdb(m[1]["sub"][i][f"RDB{r}"]))
    # stack: 5 pack arrays of shape (n_blocks, 3, 3, 3, Cin_j, Cout_j)
    packs = tuple(
        jnp.stack([n_rdb[i * 3 + r][0][j] for i in range(p.n_blocks) for r in range(3)]).reshape(
            (p.n_blocks, 3) + n_rdb[0][0][j].shape
        )
        for j in range(5)
    )
    biases = tuple(
        jnp.stack([n_rdb[i * 3 + r][1][k] for i in range(p.n_blocks) for r in range(3)]).reshape(
            (p.n_blocks, 3) + n_rdb[0][1][k].shape
        )
        for k in range(5)
    )

    def conv_wb(cp: Params):
        return _hwio(cp.weight("weight")).astype(dtype), cp.weight("bias").astype(jnp.float32)

    packed = {
        "rdb_biases": biases,
        "stem": conv_wb(m[0]),
        "trunk": conv_wb(m[1]["sub"][p.n_blocks]),
        "up": [],
        "hr": None,
        "last": None,
    }
    packed["rdb_packs"] = packs
    seq = 2
    for _ in range(int(np.log2(p.scale))):
        packed["up"].append(conv_wb(m[seq + 1]))
        seq += 3
    packed["hr"] = conv_wb(m[seq])
    packed["last"] = conv_wb(m[seq + 2])
    # block-domain tail (see _tail_packed): pre-transform the up convs to
    # subpixel form and hr/last to block form
    packed["up_sub"] = [(_subpixel_kernel(w), b) for w, b in packed["up"]]
    if packed["up_sub"]:
        packed["hr_blk"] = (_block_kernel(packed["hr"][0]), packed["hr"][1])
        packed["last_blk"] = (_block_kernel(packed["last"][0]), packed["last"][1])
    return packed


# --- upsample tail in the 2x block domain -----------------------------------
#
# The reference tail (esrgan.cpp:13-19,75-82) runs `nearest 2x + 3x3 conv`
# stages plus two final convs at the FULL output resolution, where 64->64
# convs measure ~26 TF/s and the 64->3 last conv is Cout-3 tiling-bound
# (53 ms alone at 4096^2 on v5e). Exact rewrites keep that work at lower
# resolution with 4x the channels (full MXU lane fill):
#
#  * nearest-up 2x + conv == conv AT LOW RES with a (di,dj)-merged kernel
#    followed by depth-to-space: output sub-row di reads source block row
#    i + floor((di+u-1)/2), so each sub-position is a 2x2 sub-kernel of
#    summed taps, packed as Cout -> 4*Cout (`_subpixel_kernel`).
#  * a 3x3 conv at resolution 2R == a 3x3 conv on the (R, R, 4C) block
#    tensor with kernel W_blk[ry,rx,(s,sx,ci),(di,dj,co)] = w[u,v,ci,co]
#    where u = 2*ry + s - di + 1 in [0,2] (`_block_kernel`); zero padding
#    at block granularity reproduces the logical zero padding exactly.
#
# So the tail becomes: subpixel up stages (d2s between them), with the LAST
# up stage left in block form and hr + last run as block-domain convs; one
# depth-to-space on the 3-channel result materializes the full-res image.
# Measured on v5e at 1024^2 input, scale 4: 130 ms -> 65 ms (exact same
# math; see scripts/exp_tail.py).

# _SUB_MAP[ry, s, di, u] = 1 iff tap u of the logical kernel lands on block
# row offset ry-1 with sub-row s for output sub-position di.
_SUB_MAP = np.zeros((3, 2, 2, 3), np.float32)
for _di in (0, 1):
    for _s in (0, 1):
        for _ry in (-1, 0, 1):
            _u = 2 * _ry + _s - _di + 1
            if 0 <= _u <= 2:
                _SUB_MAP[_ry + 1, _s, _di, _u] = 1.0
del _di, _s, _ry, _u


def _subpixel_kernel(w_hwio):
    """(3,3,Cin,Cout) -> (3,3,Cin,4*Cout): nearest-up 2x + conv as one
    low-res conv; output channel order (di, dj, co)."""
    # input is NOT block-form: sum the sub-map over s (source rows collapse)
    m = jnp.asarray(_SUB_MAP.sum(axis=1))  # (3, 2, 3): [ry, di, u]
    k = jnp.einsum("rdu,cev,uvio->rcideo", m, m, w_hwio.astype(jnp.float32))
    return k.reshape(3, 3, k.shape[2], -1).astype(w_hwio.dtype)


def _block_kernel(w_hwio):
    """(3,3,Cin,Cout) -> (3,3,4*Cin,4*Cout): logical 3x3 conv at 2R on the
    (R, R, 4C) block tensor; channel order (s, sx, ci) in, (di, dj, co) out."""
    m = jnp.asarray(_SUB_MAP)  # (3, 2, 2, 3): [ry, s, di, u]
    k = jnp.einsum("rsdu,cxev,uvio->rcsxideo", m, m, w_hwio.astype(jnp.float32))
    r = k.shape
    return k.reshape(3, 3, 4 * r[4], 4 * r[7]).astype(w_hwio.dtype)


def _block_to_space(x, cout: int):
    """(N, H, W, 4*cout) block tensor -> (N, 2H, 2W, cout)."""
    n, h, w, _ = x.shape
    x = x.reshape(n, h, w, 2, 2, cout)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * w, cout)


def _conv_b(x, w, b, act: bool = False):
    return _conv_p(x, (w, b), act)


def _tail_packed(packed: dict, x):
    """Upsample + hr + last over pre-transformed weights (see above)."""
    ups = packed.get("up_sub", ())
    if not ups:  # scale 1: no block domain to ride
        x = _conv_p(x, packed["hr"], act=True)
        return _conv_p(x, packed["last"])
    nf = x.shape[-1]
    for w, b in ups[:-1]:
        x = _block_to_space(_conv_b(x, w, jnp.tile(b, 4), act=True), nf)
    w, b = ups[-1]
    x = _conv_b(x, w, jnp.tile(b, 4), act=True)  # stays in block form
    w, b = packed["hr_blk"]
    x = _conv_b(x, w, jnp.tile(b, 4), act=True)
    w, b = packed["last_blk"]
    x = _conv_b(x, w, jnp.tile(b, 4))
    return _block_to_space(x, packed["last"][0].shape[-1])


def _conv_p(x, wb, act: bool = False):
    w, b = wb
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b
    if act:
        y = jnp.where(y >= 0, y, 0.2 * y)
    return y.astype(x.dtype)


def _rdb_packed(x, packs, biases, gc: int, nf: int):
    """One residual dense block in split-contribution form (see above)."""

    def conv(src, w):
        return jax.lax.conv_general_dilated(
            src, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(src.dtype)

    lrelu = lambda t: jnp.where(t >= 0, t, 0.2 * t)
    b1, b2, b3, b4, b5 = (b.astype(x.dtype) for b in biases)
    o = nf  # every pack leads with its conv5 contribution (see pack_rdb)
    p0 = conv(x, packs[0])  # [c5 | c1 c2 c3 c4]
    x1 = lrelu(p0[..., o : o + gc] + b1)
    p1 = conv(x1, packs[1])  # [c5 | c2 c3 c4]
    x2 = lrelu(p0[..., o + gc : o + 2 * gc] + p1[..., o : o + gc] + b2)
    p2 = conv(x2, packs[2])  # [c5 | c3 c4]
    x3 = lrelu(p0[..., o + 2 * gc : o + 3 * gc] + p1[..., o + gc : o + 2 * gc] + p2[..., o : o + gc] + b3)
    p3 = conv(x3, packs[3])  # [c5 | c4]
    x4 = lrelu(
        p0[..., o + 3 * gc : o + 4 * gc]
        + p1[..., o + 2 * gc : o + 3 * gc]
        + p2[..., o + gc : o + 2 * gc]
        + p3[..., o : o + gc]
        + b4
    )
    p4 = conv(x4, packs[4])  # [c5]
    x5 = p0[..., :o] + p1[..., :o] + p2[..., :o] + p3[..., :o] + p4 + b5
    return x + 0.2 * x5


def esrgan_generate_packed(packed: dict, x, p: EsrganParams):
    """RRDBNet forward over packed weights — same math as esrgan_generate,
    MXU-shaped convs, scan over the identical RRDB blocks."""
    gc, nf = packed["gc"], packed["nf"]
    x = _conv_p(x, packed["stem"])
    sub = x

    def rrdb_body(carry, wb):
        packs, biases = wb
        y = carry
        for r in range(3):
            y = _rdb_packed(y, [pk[r] for pk in packs], [b[r] for b in biases], gc, nf)
        return carry + 0.2 * y, None

    sub, _ = jax.lax.scan(rrdb_body, sub, (packed["rdb_packs"], packed["rdb_biases"]))
    sub = _conv_p(sub, packed["trunk"])
    x = x + sub
    return _tail_packed(packed, x)


def _esrgan_run_fn(p: EsrganParams, dtype, to_u8: bool):
    def run(weights, x_u8, gc, nf):
        from ..ops.preprocess import normalize_u8

        x = normalize_u8(x_u8, dtype=dtype)
        y = esrgan_generate_packed({**weights, "gc": gc, "nf": nf}, x, p)
        if to_u8:
            y = jnp.clip(y.astype(jnp.float32), 0.0, 1.0) * 255.0
            y = y.astype(jnp.uint8)
        return y

    return run


@lru_cache(maxsize=8)
def _esrgan_program(p: EsrganParams, dtype, to_u8: bool):
    """Jitted generate shared across model instances (single-device)."""
    return jax.jit(_esrgan_run_fn(p, dtype, to_u8), static_argnames=("gc", "nf"))


class EsrganModel:
    """High-level model handle (reference esrgan_model, vision.h + the
    esrgan_load_model/esrgan_compute pair in vision.cpp:209-253).

    ``mesh``: optional jax.sharding.Mesh — weights are replicated onto the
    mesh and the tile batch is dp-sharded, so N chips super-resolve N tiles
    per step over ICI (the reference's sequential per-tile loop,
    vision.cpp:240-251, scaled by the mesh size)."""

    def __init__(self, params: dict, p: EsrganParams, device: Device, mesh=None):
        from ..core.weights import cast_float_params

        self.params = cast_float_params(params, device.preferred_float_type)
        self.p = p
        self.device = device
        self.mesh = mesh
        from ..core.graph import GraphCache

        self._graphs = GraphCache(self._build)
        self._packed_cache = {}

    def _packed(self):
        if not self._packed_cache:
            packed = esrgan_pack_weights(self.params, self.p, dtype=self.device.preferred_float_type)
            if self.mesh is not None:
                from ..parallel import replicate

                gc, nf = packed.pop("gc"), packed.pop("nf")
                packed = jax.device_put(packed, replicate(self.mesh))
                packed["gc"], packed["nf"] = gc, nf
            self._packed_cache["packed"] = packed
        return self._packed_cache["packed"]

    def _build(self, to_u8: bool):
        if self.mesh is not None:
            from ..parallel import batch_sharding

            return jax.jit(
                _esrgan_run_fn(self.p, self.device.preferred_float_type, to_u8),
                static_argnames=("gc", "nf"),
                in_shardings=(None, batch_sharding(self.mesh)),
                out_shardings=batch_sharding(self.mesh),
            )
        return _esrgan_program(self.p, self.device.preferred_float_type, to_u8)

    def _fn(self, key, to_u8: bool, extent: tuple[int, int]):
        """Jitted executable for this shape bucket. (A row-pair
        space-to-depth trunk variant was measured slightly SLOWER than this
        packed path at 1024^2 on v5e — 1329 vs 1279 ms; it lives on as a
        research artifact in scripts/esrgan_s2d.py, NOTES.md round 2.)"""
        fn = self._graphs.get((key, to_u8), to_u8)
        pk = dict(self._packed())
        gc, nf = pk.pop("gc"), pk.pop("nf")
        return lambda x_u8: fn(pk, x_u8, gc, nf)

    def _compute_whole(self, image: Image) -> Image:
        """Single-program path: u8 in, u8 out, zero host-side pixel math."""
        fn = self._fn(("whole", image.extent), True, image.extent)
        src = image.to_rgb_u8()
        y = np.asarray(fn(jnp.asarray(src[None])))[0]
        rgba = np.concatenate([y, np.full((*y.shape[:2], 1), 255, np.uint8)], axis=2)
        return Image(np.ascontiguousarray(rgba), ImageFormat.rgba_u8)

    def compute(self, image: Image, tile_size: int | None = None, batch: int = 4) -> Image:
        """Tiled super-resolution (reference esrgan_compute, vision.cpp:220-253).

        TPU-first: the default tile size is 1024 — measured conv throughput
        at 64 channels is ~4.4x higher at 1024^2 than at the reference's
        224^2 tiles (small spatial extents underutilize the MXU), and HBM
        easily holds the whole-image activations. Images beyond the tile
        size fall back to batched-tile execution with host-side merge.
        """
        if tile_size is None:
            from ..core.device import BackendType

            tile_size = 1024 if self.device.type & BackendType.tpu else ESRGAN_DEFAULT_TILE_SIZE
        if self.mesh is not None:
            dp = self.mesh.shape["dp"]
            batch = ((batch + dp - 1) // dp) * dp
        elif max(image.extent) <= tile_size:
            return self._compute_whole(image)
        tiles = TileLayout(image.extent, tile_size, ESRGAN_TILE_OVERLAP)
        tiles_out = tile_scale(tiles, self.p.scale)
        tw, th = tiles.tile_size
        n = tiles.total()

        # gather tiles with replicate padding (reference image_u8_to_f32
        # tiled reads, image.cpp:219-226) — vectorized host-side, still u8;
        # the /255 cast happens on device
        src = image.to_rgb_u8()
        h, w = src.shape[:2]
        stack = np.empty((n, th, tw, 3), np.uint8)
        for t in range(n):
            cx, cy = tiles.coord(t)
            sx, sy = tiles.start((cx, cy))
            ys = np.minimum(np.arange(sy, sy + th), h - 1)
            xs = np.minimum(np.arange(sx, sx + tw), w - 1)
            stack[t] = src[np.ix_(ys, xs)]

        fn = self._fn((batch, (tw, th)), False, (tw, th))
        out_tiles = np.empty((n, th * self.p.scale, tw * self.p.scale, 3), np.float32)
        for i in range(0, n, batch):
            chunk = stack[i : i + batch]
            pad = batch - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, th, tw, 3), np.uint8)], 0)
            y = fn(jnp.asarray(chunk))
            out_tiles[i : i + batch] = np.asarray(y.astype(jnp.float32))[: batch - pad if pad else batch]

        # overlap blend (reference tile_merge, image.cpp:655-693)
        out = image_alloc(tiles_out.image_extent, ImageFormat.rgb_f32)
        for t in range(n):
            c = tiles_out.coord(t)
            beg = tiles_out.start(c)
            end = tiles_out.end(c)
            blend = tile_weights(tiles_out, c)[:, :, None]
            region = out_tiles[t][: end[1] - beg[1], : end[0] - beg[0]]
            out.data[beg[1]:end[1], beg[0]:end[0]] += blend * region
        return image_f32_to_u8(out, ImageFormat.rgba_u8)


def esrgan_load_model(filepath: str, device: Device | None = None, mesh=None) -> EsrganModel:
    """Quantized files always expand here (no keep_quantized path): the
    packed trunk (esrgan_pack_weights) consumes concatenated arrays, and
    an int8-resident trunk measured strictly slower on v5e anyway
    (NOTES.md round-3 int8 findings)."""
    device = device or backend_init()
    file = model_load(filepath)
    p = esrgan_detect_params(file)
    params = load_weights(file, device)
    return EsrganModel(params, p, device, mesh=mesh)


def esrgan_compute(model: EsrganModel, image: Image) -> Image:
    return model.compute(image)

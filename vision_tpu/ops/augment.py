"""On-device data augmentation — jittable, batched, explicit-key random.

The training input pipeline's device half: host threads decode + resize
(train.data_loader), these ops run INSIDE the jitted train step (or a
jitted augment step) on the accelerator, where they fuse into the
surrounding program — no host RNG, no per-sample Python, no dynamic
shapes. Every op follows the same contract:

  * input is a batched NHWC f32 array in [0, 1] (labels where noted);
  * ``key`` is a ``jax.random`` key; per-sample randomness comes from an
    internal split, so one key randomizes the whole batch and the same
    key reproduces the same batch bit-exactly;
  * output shapes are static — random geometry is expressed as gathers /
    masks / ``jnp.where`` selections, never as data-dependent shapes, so
    XLA compiles one program per batch geometry.

The set mirrors the standard torchvision/timm recipe (flip, crop,
resized-crop, color jitter, erasing) plus the batch-level mixers (mixup,
cutmix). Deviations from torch, by design for jit: ``random_resized_crop``
clamps its sampled box to the image instead of torch's 10-try rejection
loop, and ``color_jitter`` applies brightness -> contrast -> saturation ->
hue in that fixed order instead of a random order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.errors import raise_error

__all__ = [
    "random_flip",
    "random_crop",
    "random_resized_crop",
    "color_jitter",
    "random_erasing",
    "mixup",
    "cutmix",
    "rgb_to_grayscale",
]

_GRAY = jnp.array([0.299, 0.587, 0.114], jnp.float32)  # ITU-R 601 (torch)


def rgb_to_grayscale(x, keepdims: bool = True):
    """(..., 3) RGB -> luminance; ``keepdims`` keeps a size-1 channel."""
    g = jnp.tensordot(x, _GRAY.astype(x.dtype), axes=[[-1], [0]])
    return g[..., None] if keepdims else g


def random_flip(key, x, p: float = 0.5, axis: int = 2):
    """Per-sample flip along ``axis`` (2 = horizontal for NHWC)."""
    mask = jax.random.bernoulli(key, p, (x.shape[0],))
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    return jnp.where(mask.reshape(shape), jnp.flip(x, axis=axis), x)


def random_crop(key, x, size: tuple[int, int]):
    """Per-sample random (th, tw) crop of a (N, H, W, C) batch."""
    n, h, w, _ = x.shape
    th, tw = size
    if th > h or tw > w:
        raise_error("random_crop: size {} exceeds input {}", (th, tw), (h, w))
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (n,), 0, h - th + 1)
    x0 = jax.random.randint(kx, (n,), 0, w - tw + 1)

    def one(img, yy, xx):
        return jax.lax.dynamic_slice(img, (yy, xx, 0), (th, tw, img.shape[-1]))

    return jax.vmap(one)(x, y0, x0)


def _bilinear_box(img, y0, x0, ch, cw, out_hw):
    """Sample the (continuous) box [y0, y0+ch) x [x0, x0+cw) of one HWC
    image onto a static (oh, ow) grid with bilinear weights (gathers)."""
    h, w, _ = img.shape
    oh, ow = out_hw
    ys = y0 + (jnp.arange(oh, dtype=jnp.float32) + 0.5) * ch / oh - 0.5
    xs = x0 + (jnp.arange(ow, dtype=jnp.float32) + 0.5) * cw / ow - 0.5
    yf = jnp.clip(ys, 0.0, h - 1.0)
    xf = jnp.clip(xs, 0.0, w - 1.0)
    yi = jnp.clip(jnp.floor(yf).astype(jnp.int32), 0, h - 2) if h > 1 else jnp.zeros_like(yf, jnp.int32)
    xi = jnp.clip(jnp.floor(xf).astype(jnp.int32), 0, w - 2) if w > 1 else jnp.zeros_like(xf, jnp.int32)
    wy = (yf - yi).astype(img.dtype)[:, None, None]
    wx = (xf - xi).astype(img.dtype)[None, :, None]
    r0 = img[yi]          # (oh, W, C)
    r1 = img[jnp.minimum(yi + 1, h - 1)]
    top = r0[:, xi] * (1 - wx) + r0[:, jnp.minimum(xi + 1, w - 1)] * wx
    bot = r1[:, xi] * (1 - wx) + r1[:, jnp.minimum(xi + 1, w - 1)] * wx
    return top * (1 - wy) + bot * wy


def random_resized_crop(
    key,
    x,
    size: tuple[int, int],
    scale: tuple[float, float] = (0.08, 1.0),
    ratio: tuple[float, float] = (3 / 4, 4 / 3),
):
    """Per-sample random box (area fraction ~ U(scale), aspect ~
    log-U(ratio), clamped to the image) resampled bilinearly to ``size``.

    The torchvision semantics minus the 10-try rejection loop (a
    data-dependent loop doesn't jit): an oversized sample clamps to the
    image bounds instead of being re-drawn.
    """
    n, h, w, _ = x.shape
    oh, ow = size
    ka, kr, ky, kx = jax.random.split(key, 4)
    frac = jax.random.uniform(ka, (n,), minval=scale[0], maxval=scale[1])
    logr = jax.random.uniform(
        kr, (n,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(logr)  # w / h
    area = frac * (h * w)
    cw = jnp.clip(jnp.sqrt(area * aspect), 1.0, float(w))
    ch = jnp.clip(jnp.sqrt(area / aspect), 1.0, float(h))
    y0 = jax.random.uniform(ky, (n,)) * (h - ch)
    x0 = jax.random.uniform(kx, (n,)) * (w - cw)
    return jax.vmap(lambda img, a, b, c, d: _bilinear_box(img, a, b, c, d, (oh, ow)))(
        x, y0, x0, ch, cw
    )


# ---------------------------------------------------------------------------
# color


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        mx == r,
        ((g - b) / safe) % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    )
    h = jnp.where(d == 0, 0.0, h) / 6.0
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    sel = [i == k for k in range(6)]
    r = jnp.select(sel, [v, q, p, p, t, v])
    g = jnp.select(sel, [t, v, v, q, p, p])
    b = jnp.select(sel, [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(
    key,
    x,
    brightness: float = 0.0,
    contrast: float = 0.0,
    saturation: float = 0.0,
    hue: float = 0.0,
):
    """Per-sample photometric jitter on (N, H, W, 3) RGB in [0, 1].

    Factor distributions match torchvision (uniform in
    ``[max(0, 1-v), 1+v]``; hue shift uniform in ``[-hue, hue]`` turns,
    ``hue <= 0.5``), applied in the fixed order brightness -> contrast ->
    saturation -> hue. Output is clipped back to [0, 1].
    """
    n = x.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    shape = (n, 1, 1, 1)

    def factor(k, v):
        return jax.random.uniform(k, shape, minval=max(0.0, 1.0 - v), maxval=1.0 + v)

    if brightness:
        x = jnp.clip(x * factor(kb, brightness), 0.0, 1.0)
    if contrast:
        mean = jnp.mean(rgb_to_grayscale(x), axis=(1, 2, 3), keepdims=True)
        x = jnp.clip((x - mean) * factor(kc, contrast) + mean, 0.0, 1.0)
    if saturation:
        gray = rgb_to_grayscale(x)
        x = jnp.clip(gray + (x - gray) * factor(ks, saturation), 0.0, 1.0)
    if hue:
        if hue > 0.5:
            raise_error("color_jitter: hue must be <= 0.5 (turns), got {}", hue)
        shift = jax.random.uniform(kh, (n, 1, 1), minval=-hue, maxval=hue)
        h, s, v = _rgb_to_hsv(x)
        x = jnp.clip(_hsv_to_rgb((h + shift) % 1.0, s, v), 0.0, 1.0)
    return x


def random_erasing(
    key,
    x,
    p: float = 0.5,
    scale: tuple[float, float] = (0.02, 0.33),
    ratio: tuple[float, float] = (0.3, 3.3),
    value: float = 0.0,
):
    """Per-sample rectangle erase (Zhong et al.; timm's random_erase).

    With probability ``p`` a box of area fraction ~ U(scale) and aspect ~
    log-U(ratio) (clamped to the image) is filled with ``value``. The box
    is a mask built from iota comparisons — static shapes, fuses into the
    surrounding program.
    """
    n, h, w, _ = x.shape
    kp, ka, kr, ky, kx = jax.random.split(key, 5)
    on = jax.random.bernoulli(kp, p, (n,))
    frac = jax.random.uniform(ka, (n,), minval=scale[0], maxval=scale[1])
    aspect = jnp.exp(
        jax.random.uniform(kr, (n,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    )
    area = frac * (h * w)
    bw = jnp.clip(jnp.sqrt(area * aspect), 1.0, float(w))
    bh = jnp.clip(jnp.sqrt(area / aspect), 1.0, float(h))
    y0 = jax.random.uniform(ky, (n,)) * (h - bh)
    x0 = jax.random.uniform(kx, (n,)) * (w - bw)
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    inside = (
        (ys >= y0[:, None, None])
        & (ys < (y0 + bh)[:, None, None])
        & (xs >= x0[:, None, None])
        & (xs < (x0 + bw)[:, None, None])
    )
    mask = (inside & on[:, None, None])[..., None]
    return jnp.where(mask, jnp.asarray(value, x.dtype), x)


# ---------------------------------------------------------------------------
# batch mixers


def mixup(key, x, y, alpha: float = 0.2):
    """Mixup (Zhang et al.): convex-combine each sample with a random
    partner. ``lam ~ Beta(alpha, alpha)`` (one draw per batch, like timm);
    ``y`` is any float label pytree with the same leading batch axis
    (one-hot / dense targets). Returns ``(x', y', lam)``."""
    kl, kp = jax.random.split(key)
    n = x.shape[0]
    lam = jax.random.beta(kl, alpha, alpha)
    perm = jax.random.permutation(kp, n)
    mix = lambda a: lam.astype(a.dtype) * a + (1 - lam).astype(a.dtype) * a[perm]
    return mix(x), jax.tree_util.tree_map(mix, y), lam


def cutmix(key, x, y, alpha: float = 1.0):
    """CutMix (Yun et al.): paste a random box from a partner sample.

    One ``lam ~ Beta(alpha, alpha)`` per batch sets the box area
    ``(1 - lam)``; the returned ``lam`` is corrected to the ACTUAL pasted
    area after clamping at the borders, and labels mix with that value.
    Returns ``(x', y', lam)``."""
    kl, kp, ky, kx = jax.random.split(key, 4)
    n, h, w, _ = x.shape
    lam = jax.random.beta(kl, alpha, alpha)
    perm = jax.random.permutation(kp, n)
    cut = jnp.sqrt(1.0 - lam)
    bh, bw = cut * h, cut * w
    cy = jax.random.uniform(ky) * h
    cx = jax.random.uniform(kx) * w
    y0, y1 = jnp.clip(cy - bh / 2, 0, h), jnp.clip(cy + bh / 2, 0, h)
    x0, x1 = jnp.clip(cx - bw / 2, 0, w), jnp.clip(cx + bw / 2, 0, w)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    box = ((ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1))[None, :, :, None]
    mixed = jnp.where(box, x[perm], x)
    lam_true = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)
    mix = lambda a: lam_true.astype(a.dtype) * a + (1 - lam_true).astype(a.dtype) * a[perm]
    return mixed, jax.tree_util.tree_map(mix, y), lam_true

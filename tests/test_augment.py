"""On-device augmentation tests (vision_tpu/ops/augment.py).

Pinned: key-determinism, degenerate-parameter identities, geometric
correctness against small numpy oracles, mask/box area accounting for
erasing/cutmix, label-mixing consistency (the lam used on images is the
lam used on labels), and that every op compiles under jit with static
shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu.core.errors import VispError
from vision_tpu.ops.augment import (
    color_jitter,
    cutmix,
    mixup,
    random_crop,
    random_erasing,
    random_flip,
    random_resized_crop,
    rgb_to_grayscale,
)


def _batch(n=4, h=12, w=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(size=(n, h, w, c)).astype(np.float32))


def test_key_determinism_and_variation():
    x = _batch()
    k = jax.random.PRNGKey(7)
    a = random_resized_crop(k, x, (8, 8))
    b = random_resized_crop(k, x, (8, 8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = random_resized_crop(jax.random.PRNGKey(8), x, (8, 8))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_random_flip_extremes():
    x = _batch()
    k = jax.random.PRNGKey(0)
    np.testing.assert_array_equal(
        np.asarray(random_flip(k, x, p=1.0)), np.asarray(jnp.flip(x, axis=2))
    )
    np.testing.assert_array_equal(np.asarray(random_flip(k, x, p=0.0)), np.asarray(x))
    # vertical
    np.testing.assert_array_equal(
        np.asarray(random_flip(k, x, p=1.0, axis=1)), np.asarray(jnp.flip(x, axis=1))
    )
    # per-sample: at p=0.5 over a larger batch both outcomes appear
    big = _batch(n=32)
    f = np.asarray(random_flip(jax.random.PRNGKey(3), big, p=0.5))
    flipped = np.asarray(jnp.flip(big, axis=2))
    per = [np.array_equal(f[i], flipped[i]) for i in range(32)]
    assert any(per) and not all(per)


def test_random_crop_is_contiguous_window():
    n, h, w = 5, 10, 14
    # encode coordinates in the pixel value: v = row * w + col
    coords = np.arange(h * w, dtype=np.float32).reshape(1, h, w, 1)
    x = jnp.asarray(np.tile(coords, (n, 1, 1, 1)))
    out = np.asarray(random_crop(jax.random.PRNGKey(1), x, (4, 6)))[..., 0]
    for i in range(n):
        v0 = out[i, 0, 0]
        r0, c0 = divmod(int(v0), w)
        assert 0 <= r0 <= h - 4 and 0 <= c0 <= w - 6
        expect = coords[0, r0 : r0 + 4, c0 : c0 + 6, 0]
        np.testing.assert_array_equal(out[i], expect)
    with pytest.raises(VispError):
        random_crop(jax.random.PRNGKey(0), x, (11, 6))


def _np_bilinear_full(img, oh, ow):
    """Numpy oracle: bilinear resample of the FULL image to (oh, ow) with
    half-pixel centers — the box (0, 0, H, W) case of _bilinear_box."""
    h, w, c = img.shape
    ys = np.clip((np.arange(oh) + 0.5) * h / oh - 0.5, 0, h - 1)
    xs = np.clip((np.arange(ow) + 0.5) * w / ow - 0.5, 0, w - 1)
    yi = np.clip(np.floor(ys).astype(int), 0, h - 2)
    xi = np.clip(np.floor(xs).astype(int), 0, w - 2)
    wy = (ys - yi)[:, None, None]
    wx = (xs - xi)[None, :, None]
    r0, r1 = img[yi], img[np.minimum(yi + 1, h - 1)]
    top = r0[:, xi] * (1 - wx) + r0[:, np.minimum(xi + 1, w - 1)] * wx
    bot = r1[:, xi] * (1 - wx) + r1[:, np.minimum(xi + 1, w - 1)] * wx
    return top * (1 - wy) + bot * wy


def test_random_resized_crop_full_box_matches_oracle():
    # scale=(1,1) on a square image with ratio=(1,1): the box IS the image,
    # so the output must equal a plain bilinear resize
    x = _batch(n=3, h=10, w=10)
    out = np.asarray(random_resized_crop(jax.random.PRNGKey(2), x, (6, 7), scale=(1.0, 1.0), ratio=(1.0, 1.0)))
    for i in range(3):
        np.testing.assert_allclose(
            out[i], _np_bilinear_full(np.asarray(x[i]), 6, 7), atol=1e-5, rtol=1e-5
        )


def test_random_resized_crop_range_and_shape():
    x = _batch(n=4, h=9, w=13)
    out = np.asarray(random_resized_crop(jax.random.PRNGKey(5), x, (8, 8)))
    assert out.shape == (4, 8, 8, 3)
    assert out.min() >= float(x.min()) - 1e-6 and out.max() <= float(x.max()) + 1e-6


def test_color_jitter_identities():
    x = _batch()
    k = jax.random.PRNGKey(0)
    np.testing.assert_array_equal(np.asarray(color_jitter(k, x)), np.asarray(x))
    # saturating a gray image is a no-op
    gray = jnp.tile(rgb_to_grayscale(x), (1, 1, 1, 3))
    np.testing.assert_allclose(
        np.asarray(color_jitter(k, gray, saturation=0.9)), np.asarray(gray), atol=1e-6
    )
    # brightness factor bounds: output within [ (1-v) x, min(1, (1+v) x) ]
    b = np.asarray(color_jitter(k, x, brightness=0.4))
    xn = np.asarray(x)
    assert (b >= xn * 0.6 - 1e-6).all() and (b <= np.minimum(xn * 1.4, 1.0) + 1e-6).all()


def test_color_jitter_hue_half_turn_is_complement():
    # hue range forced to exactly 0.5 turns by minval=maxval: red -> cyan
    n = 2
    red = jnp.zeros((n, 4, 4, 3), jnp.float32).at[..., 0].set(1.0)
    # drive through the internal path with a fixed shift by using hue=0.5
    # and checking AGAINST both extremes (shift in [-0.5, 0.5] wraps to the
    # same complement at |shift| = 0.5); use the deterministic conversion
    # helpers instead for the exact property
    from vision_tpu.ops.augment import _hsv_to_rgb, _rgb_to_hsv

    h, s, v = _rgb_to_hsv(red)
    out = np.asarray(_hsv_to_rgb((h + 0.5) % 1.0, s, v))
    np.testing.assert_allclose(out, np.broadcast_to([0.0, 1.0, 1.0], out.shape), atol=1e-6)
    # roundtrip: hsv(rgb) -> rgb is the identity on random colors
    x = _batch()
    h, s, v = _rgb_to_hsv(x)
    np.testing.assert_allclose(np.asarray(_hsv_to_rgb(h, s, v)), np.asarray(x), atol=1e-6)


def test_random_erasing_box_accounting():
    x = _batch(n=6, h=20, w=20)
    out = np.asarray(random_erasing(jax.random.PRNGKey(4), x, p=1.0, value=-1.0))
    xn = np.asarray(x)
    for i in range(6):
        erased = out[i, :, :, 0] == -1.0
        frac = erased.mean()
        assert 0.01 <= frac <= 0.45, frac  # scale (0.02, 0.33) with clamping slack
        # erased region is an axis-aligned rectangle: the bounding box of
        # the mask is exactly the mask
        ys, xs = np.where(erased)
        assert erased[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1].all()
        # everything outside is untouched
        np.testing.assert_array_equal(out[i][~erased], xn[i][~erased])
    np.testing.assert_array_equal(
        np.asarray(random_erasing(jax.random.PRNGKey(4), x, p=0.0)), xn
    )


def test_mixup_consistency():
    x = _batch(n=8)
    y = jnp.asarray(np.eye(8, dtype=np.float32))  # unique one-hot per sample
    mx, my, lam = mixup(jax.random.PRNGKey(9), x, y, alpha=0.4)
    lam = float(lam)
    assert 0.0 <= lam <= 1.0
    # recover the permutation partner from the label mix and check the
    # image mixed with the SAME lam and partner
    xn, yn = np.asarray(x), np.asarray(y)
    mxn, myn = np.asarray(mx), np.asarray(my)
    # labels: my = lam*y + (1-lam)*y[perm] -> y[perm] = (my - lam*y)/(1-lam)
    if abs(1 - lam) > 1e-3:
        y_perm = (myn - lam * yn) / (1 - lam)
        x_perm = (mxn - lam * xn) / (1 - lam)
        # each recovered row must be one of the original rows
        for i in range(8):
            j = int(np.argmin(np.abs(yn - y_perm[i]).sum(axis=1)))
            np.testing.assert_allclose(x_perm[i], xn[j], atol=1e-3)


def test_cutmix_pixels_and_labels():
    x = _batch(n=6, h=16, w=16)
    y = jnp.asarray(np.eye(6, dtype=np.float32))
    mx, my, lam = cutmix(jax.random.PRNGKey(11), x, y, alpha=1.0)
    mxn, xn = np.asarray(mx), np.asarray(x)
    lam = float(lam)
    # every pixel comes verbatim from self or from one fixed partner
    myn, yn = np.asarray(my), np.asarray(y)
    for i in range(6):
        from_self = np.isclose(mxn[i], xn[i], atol=1e-7).all(axis=-1)
        partners = np.where(myn[i] > 1e-6)[0]
        ok = from_self
        for j in partners:
            ok = ok | np.isclose(mxn[i], xn[j], atol=1e-7).all(axis=-1)
        assert ok.all()
        # label weight on self equals the pixel fraction kept (lam)
        kept = from_self.mean()
        assert abs(myn[i, i] - lam) < 0.1 or kept >= lam - 1e-6


def test_all_ops_jit_compile():
    x = _batch()
    y = jnp.ones((4, 5), jnp.float32) / 5
    k = jax.random.PRNGKey(0)

    @jax.jit
    def pipeline(k, x, y):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        x = random_flip(k1, x)
        x = random_resized_crop(k2, x, (8, 8))
        x = color_jitter(k3, x, brightness=0.2, contrast=0.2, saturation=0.2, hue=0.1)
        x = random_erasing(k4, x, p=0.3)
        return mixup(k5, x, y, alpha=0.2)

    mx, my, lam = pipeline(k, x, y)
    assert mx.shape == (4, 8, 8, 3) and my.shape == (4, 5)
    # label rows still sum to 1 (convex combination of distributions)
    np.testing.assert_allclose(np.asarray(my).sum(axis=1), 1.0, atol=1e-6)

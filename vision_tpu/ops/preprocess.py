"""Device-side input preprocessing.

The reference converts u8 pixels to normalized f32 on the host and uploads
the f32 result (image_u8_to_f32 before transfer_to_backend, e.g.
vision.cpp:241-246). TPU-first, the u8 pixels are uploaded raw (4x less
host->device traffic) and the cast + normalize runs inside the jitted
program, fused by XLA into the first conv.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["normalize_u8", "IMAGENET_MEAN", "IMAGENET_STD"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_u8(x, mean=None, std=None, dtype=jnp.bfloat16):
    """(N, H, W, C) uint8 -> normalized float: ((x/255) - mean) / std."""
    xf = x.astype(jnp.float32) * (1.0 / 255.0)
    if mean is not None:
        xf = xf - jnp.asarray(mean, jnp.float32)
    if std is not None:
        xf = xf / jnp.asarray(std, jnp.float32)
    return xf.astype(dtype)

"""Image layer — containers, IO, conversions, filters, tiling.

TPU-native re-provision of the reference image layer (src/visp/image.cpp,
include/visp/image.h). Host-side code is vectorized numpy (the reference is
scalar C++ loops); the pixel *semantics* are kept bit-for-bit where tests
depend on them:

  * u8 pixels load as ``v/255`` f32; stores clamp to [0,1] and truncate to
    ``uint8(v*255)`` (reference image-impl.h:17-40).
  * ``image_u8_to_f32`` computes ``(src/255 + offset) * scale`` with
    replicate-pad reads starting at ``tile_offset`` (image.cpp:215-249).
  * ``image_f32_to_u8`` computes ``src * scale + offset`` (image.cpp:257-282).
  * box blur = separable sliding window over edge-replicated signal
    (image.cpp:358-419); erosion = min-filter with replicate border
    (image.cpp:509-535).
  * RMS difference loads pixels through the same 4-lane semantics the
    reference uses (alpha splats to 4 lanes, rgb gets alpha=1) so thresholds
    carry over exactly (image.cpp:584-607, image-impl.h:17-31).

Device-side fused variants of the pre/post pipelines live with the models
(crop/normalize/merge folded into the jitted XLA program).
"""

from .image import (
    Image,
    ImageFormat,
    alpha_channel,
    channel_map,
    image_alloc,
    image_alpha_composite,
    image_blur,
    image_clear,
    image_difference_rms,
    image_erosion,
    image_estimate_foreground,
    image_f32_to_u8,
    image_load,
    image_load_array,
    image_normalize,
    image_save,
    image_scale,
    preprocess_scale_method,
    image_set_alpha,
    image_to_mask,
    image_u8_to_f32,
    is_float,
    n_channels,
)
from .tiling import TileLayout, tile_merge, tile_scale, tile_weights

__all__ = [
    "Image",
    "ImageFormat",
    "alpha_channel",
    "channel_map",
    "image_alloc",
    "image_alpha_composite",
    "image_blur",
    "image_clear",
    "image_difference_rms",
    "image_erosion",
    "image_estimate_foreground",
    "image_f32_to_u8",
    "image_load",
    "image_load_array",
    "image_normalize",
    "image_save",
    "image_scale",
    "preprocess_scale_method",
    "image_set_alpha",
    "image_to_mask",
    "image_u8_to_f32",
    "is_float",
    "n_channels",
    "TileLayout",
    "tile_merge",
    "tile_scale",
    "tile_weights",
]

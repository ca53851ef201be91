"""vision_tpu — a TPU-native computer-vision inference framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
vision.cpp reference (ggml/C++/Vulkan): GGUF model loading, six production
model families (MobileSAM, BiRefNet, Depth-Anything V2, MI-GAN, Real-ESRGAN,
YOLOv9t) plus the WIP SAM3, an image processing layer, tiled inference,
a CLI, and a torch-parity test workbench — all built TPU-first:

  * NHWC activations everywhere; matmuls/convs in bfloat16 on the MXU.
  * one jitted XLA program per (model, shape-bucket); no per-op dispatch.
  * Pallas kernels for ops XLA fusion can't cover (windowed attention,
    deformable conv gather).
  * multi-chip scaling via jax.sharding.Mesh + data/tensor-parallel pjit
    over ICI (batch/tile parallelism), not a ported communication layer.
"""

__version__ = "0.1.0"

from .core import (
    BackendType,
    BuildFlag,
    Device,
    GGUFFile,
    GGUFWriter,
    GraphCache,
    Params,
    VispError,
    backend_init,
    backend_is_available,
    load_weights,
    model_load,
)


def load_model(filepath: str, device=None):
    """Generic loader: detect the GGUF's family and dispatch to the arch
    loader (reference vision.cpp high-level API; see vision_tpu.api)."""
    from .api import load_model as _load_model

    return _load_model(filepath, device)


def model_detect_family(file):
    from .api import model_detect_family as _detect

    return _detect(file)


def export_model(model, dst, **kwargs):
    """AOT-export a Model's compiled programs as a portable StableHLO
    bundle (weights embedded by default; see vision_tpu.export)."""
    from .export import export_model as _export

    return _export(model, dst, **kwargs)


def load_bundle(src):
    """Open a bundle written by export_model / export_bundle."""
    from .export import load_bundle as _load

    return _load(src)

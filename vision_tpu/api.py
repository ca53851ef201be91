"""High-level model API — load/compute for every architecture.

Re-provision of the reference's vision.h/vision.cpp surface (SURVEY.md A1/A2):
per-arch ``*_load_model`` / ``*_compute`` pairs plus ``model_detect_family``
that maps a GGUF's ``general.architecture`` string to the right family
(reference src/visp/vision.cpp:7-21).
"""

from __future__ import annotations

from enum import Enum

from .core.device import Device, backend_init
from .core.errors import raise_error
from .core.gguf import GGUFFile, model_load

__all__ = ["ModelFamily", "merge_adapter", "model_detect_family", "load_model"]


class ModelFamily(Enum):
    sam = "sam"
    birefnet = "birefnet"
    depth_anything = "depth_anything"
    migan = "migan"
    esrgan = "esrgan"
    yolov9t = "yolov9t"
    sam3 = "sam3"


_ARCH_TO_FAMILY = {
    "mobile-sam": ModelFamily.sam,
    "sam": ModelFamily.sam,
    "birefnet": ModelFamily.birefnet,
    "depthanything": ModelFamily.depth_anything,
    "depth-anything": ModelFamily.depth_anything,
    "migan": ModelFamily.migan,
    "esrgan": ModelFamily.esrgan,
    "yolov9t": ModelFamily.yolov9t,
    "sam3": ModelFamily.sam3,
}


def model_detect_family(file: GGUFFile | str) -> ModelFamily:
    """(reference model_detect_family, vision.cpp:7-21)."""
    if not isinstance(file, GGUFFile):
        file = model_load(file)
    fam = _ARCH_TO_FAMILY.get(file.arch)
    if fam is None:
        raise_error("Unknown model architecture: '{}' ({})", file.arch, file.path)
    return fam


def _family_fixup(family: ModelFamily):
    """The family's converter-layout fixup pass (identity where none)."""
    if family == ModelFamily.sam:
        from .models.mobile_sam import fixup_weights

        return fixup_weights
    if family == ModelFamily.birefnet:
        from .models.birefnet import fixup_weights

        return fixup_weights
    if family == ModelFamily.depth_anything:
        from .models.depth_anything import fixup_weights

        return fixup_weights
    return lambda file, params: params


def merge_adapter(filepath, adapter, dst: str | None = None) -> str:
    """Merge a ``save_lora`` adapter file into a base GGUF.

    Deploy-time composition for the LoRA workflow: ship the base model
    once and per-task adapters as few-MB files, merge at load. The base
    loads host-side in semantic (post-fixup) form — the layout adapters
    attach against — the low-rank deltas fold in (``lora.merge_lora``),
    and the result exports as a plain deployable GGUF at ``dst`` (a
    temporary file when None) that every normal path serves. Returns the
    merged file's path. CLI: ``--adapter`` on any model-loading verb.
    """
    from .core.weights import load_weights
    from .lora import load_lora, merge_lora
    from .train import export_gguf

    file = model_load(filepath)
    family = model_detect_family(file)
    base = _family_fixup(family)(file, load_weights(file, device=None, as_numpy=True))
    merged = merge_lora(load_lora(base, adapter))
    if dst is None:
        import atexit
        import os as _os
        import tempfile

        fd, dst = tempfile.mkstemp(suffix="-merged.gguf", prefix="vision_tpu-")
        _os.close(fd)
        # loaders read all tensors during load, so the temp merged file
        # only needs to outlive the process, not the model
        atexit.register(lambda p=dst: _os.path.exists(p) and _os.unlink(p))
    return export_gguf(merged, dst, source=file)


def load_model(filepath: str | GGUFFile, device: Device | None = None,
               adapter: str | None = None):
    """Generic loader: detect the family and dispatch to the arch loader.
    The GGUF header is parsed ONCE — the open file flows through to the
    family loader (model_load passes a GGUFFile straight through).
    ``adapter`` merges a LoRA adapter file in first (``merge_adapter``)."""
    device = device or backend_init()
    if adapter is not None:
        filepath = merge_adapter(filepath, adapter)
    filepath = model_load(filepath)
    family = model_detect_family(filepath)
    if family == ModelFamily.sam:
        from .models.mobile_sam import sam_load_model

        return sam_load_model(filepath, device)
    if family == ModelFamily.birefnet:
        from .models.birefnet import birefnet_load_model

        return birefnet_load_model(filepath, device)
    if family == ModelFamily.depth_anything:
        from .models.depth_anything import depthany_load_model

        return depthany_load_model(filepath, device)
    if family == ModelFamily.migan:
        from .models.migan import migan_load_model

        return migan_load_model(filepath, device)
    if family == ModelFamily.esrgan:
        from .models.esrgan import esrgan_load_model

        return esrgan_load_model(filepath, device)
    if family == ModelFamily.yolov9t:
        from .models.yolov9t import yolov9t_load_model

        return yolov9t_load_model(filepath, device)
    if family == ModelFamily.sam3:
        from .models.sam3 import sam3_load_model

        return sam3_load_model(filepath, device)
    raise_error("No high-level loader for family {}", family)

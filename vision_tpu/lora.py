"""LoRA fine-tuning — low-rank adapters over the framework's linear layers.

The reference is inference-only (SURVEY.md §2 has no training rows); LoRA
extends the training subsystem (vision_tpu/train.py) with the standard
parameter-efficient fine-tuning recipe: for a linear weight ``W (O, I)``
learn a low-rank update ``ΔW = B @ A`` (``A (r, I)``, ``B (O, r)``,
``r << min(O, I)``), keeping ``W`` frozen. Only the adapters train, so
optimizer state shrinks ~(O*I)/(r*(O+I))-fold and a fine-tune ships as a
tiny adapter file instead of a full model.

Integration is pure data — no model changes. Adapters live in the same
flat dotted-name param dict every model uses (core/params.py), as
``{module}.lora_a`` / ``{module}.lora_b`` next to ``{module}.weight``,
and ``ops.nn.linear`` applies them whenever present (zero cost when
absent: the lookup happens at trace time). That means:

  * ``create_train_state(params, opt, trainable=LORA_TRAINABLE)`` trains
    exactly the adapters — the existing name-predicate partitioning.
  * ``jax.grad`` never touches the frozen base weights; with a mesh the
    adapters replicate (they are tiny) while the base keeps its tp/fsdp
    placement.
  * ``merge_lora`` folds ``W + B @ A`` back in for zero-overhead serving;
    ``export_gguf`` then writes a deployable file.

The conventional ``alpha / rank`` scale is FOLDED INTO ``lora_a`` at
initialization (``B`` starts at zero, so the fold is exact): apply and
merge are always plainly ``B @ A``, and no extra scale leaf can leak into
the trainable set.

Scope: adapters inject at ``ops.nn.linear`` call sites — every per-layer
transformer trunk in the package (DINOv2 / Depth-Anything, SWIN /
BiRefNet, TinyViT / MobileSAM incl. its mask decoder, SAM3's text
encoder) — and at ``ops.nn.conv_2d`` for **1x1 kernels** (they are
matmuls; the adapter runs as two rank-r 1x1 convs carrying the base
stride/pad), which reaches the 1x1-rich conv heads/necks: YOLOv9t's ELAN
cv convs + detect head, the DPT neck's reassemble 1x1s, BiRefNet's
laterals, the SAM/TinyViT neck. Still outside scope: k>1 convs and
depthwise convs (low-rank over (I*k*k) needs a factored kernel form the
package's conv layers don't carry), and weights consumed through derived
packed/stacked forms (ESRGAN's packed trunk, SAM3's vision scan stack) —
``add_lora`` raises on explicit targets with uncovered shapes, and
docs/training.md carries the per-family coverage table.

QLoRA: a block-quantized resident base (core/quant.QuantResident) takes
adapters without densifying — the base stays integer-resident and frozen
(train._is_float never selects it), models dequant it at trace time, and
only the f32 adapters train. ``merge_lora`` densifies on merge.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .core.errors import raise_error
from .core.quant import QuantResident

__all__ = [
    "LORA_TRAINABLE",
    "add_lora",
    "lora_modules",
    "merge_lora",
    "strip_lora",
    "save_lora",
    "load_lora",
]

# ``trainable=`` predicate for create_train_state: exactly the adapter
# leaves (never a base weight, never a non-adapter buffer).
LORA_TRAINABLE = r"\.lora_[ab]$"

_A, _B = ".lora_a", ".lora_b"


def _dense(v):
    return v.dequant() if isinstance(v, QuantResident) else v


def _store(params) -> Mapping[str, Any]:
    # accept either the flat dict or a core.params.Params view over it
    from .core.params import Params

    if isinstance(params, Params):
        if params.prefix:
            raise_error("lora: pass the root param dict, not a sub-tree view")
        return params.store
    return params


def lora_modules(params: Mapping[str, Any]) -> list[str]:
    """Module names (dotted prefixes) that carry a LoRA adapter pair."""
    params = _store(params)
    return sorted(k[: -len(_A)] for k in params if k.endswith(_A))


def add_lora(
    params: Mapping[str, Any],
    rank: int = 8,
    alpha: float | None = None,
    targets: str | None = None,
    seed: int = 0,
) -> dict:
    """Return a new param dict with LoRA adapters attached.

    Every 2-D float ``{module}.weight`` (linear) and every 4-D
    ``(O, I, 1, 1)`` float weight (1x1 conv — a matmul in kernel's
    clothing; ``ops.nn.conv_2d`` applies the adapter as two rank-r 1x1
    convs) whose dotted name matches the ``targets`` regex (None = all of
    them) gains ``{module}.lora_a`` (``(rank, I)``, Gaussian
    ``N(0, 1/rank)`` scaled by ``alpha/rank``) and ``{module}.lora_b``
    (``(O, rank)``, zeros) — so the forward pass is bit-identical until
    training moves ``lora_b`` off zero. k>1 convs and depthwise convs are
    skipped (see docs/training.md for the per-family coverage table).

    ``alpha`` defaults to ``rank`` (scale 1). Adapters are f32 regardless
    of the base dtype (master-weight recommendation; ``linear`` casts them
    to the activation dtype at apply time). Raises if ``targets`` matches
    nothing — a silent no-op fine-tune is the worst failure mode.
    """
    params = _store(params)
    if rank < 1:
        raise_error("add_lora: rank must be >= 1, got {}", rank)
    scale = (alpha if alpha is not None else float(rank)) / float(rank)
    pat = re.compile(targets) if targets is not None else None
    rng = np.random.default_rng(seed)
    out = dict(params)
    n = 0
    for key, v in params.items():
        if not key.endswith(".weight"):
            continue
        mod = key[: -len(".weight")]
        if pat is not None and not pat.search(mod):
            continue
        if mod + _A in params:  # already adapted
            continue
        if isinstance(v, QuantResident):
            # QLoRA: a quantized-resident base takes adapters without
            # densifying — read the layout from the residency form (a
            # dequant here would materialize every weight on device)
            shape, floaty = v.shape, True
        else:
            shape = jnp.shape(v)
            # dtype check stays on host: jnp.asarray would commit every
            # weight to the default device (a tunnel H2D per tensor on
            # TPU) just to read its dtype
            floaty = jnp.issubdtype(v.dtype, jnp.floating)
        is_linear = len(shape) == 2
        is_conv1x1 = len(shape) == 4 and shape[2] == 1 and shape[3] == 1 and shape[1] > 1
        if not (is_linear or is_conv1x1) or not floaty:
            if pat is not None:
                # an explicit target that can't take an adapter is a bug
                # in the caller's regex (k>1 conv / depthwise / norm /
                # non-float weight)
                raise_error(
                    "add_lora: target '{}' has shape {} — LoRA applies to "
                    "2-D linear weights (O, I) and 1x1 conv weights "
                    "(O, I, 1, 1) only", key, tuple(shape),
                )
            continue
        o, i = int(shape[0]), int(shape[1])
        a = (rng.normal(size=(rank, i)) * (scale / np.sqrt(rank))).astype(np.float32)
        out[mod + _A] = a
        out[mod + _B] = np.zeros((o, rank), np.float32)
        n += 1
    if n == 0:
        raise_error(
            "add_lora: no 2-D float '.weight' tensors matched targets={!r}", targets
        )
    return out


def merge_lora(params: Mapping[str, Any]) -> dict:
    """Fold every adapter into its base weight and drop the adapter leaves.

    ``W <- W + B @ A`` computed in f32, cast back to the base dtype. The
    merged dict is adapter-free: serving pays zero LoRA overhead and
    ``export_gguf`` writes a plain deployable file. A quantized-resident
    base weight dequantizes (densifies) on merge — requantize the exported
    file if block-quantized deployment is wanted.
    """
    params = _store(params)
    out = dict(params)
    for mod in lora_modules(params):
        wkey = mod + ".weight"
        if wkey not in params:
            raise_error("merge_lora: adapter '{}' has no base weight '{}'", mod, wkey)
        w = _dense(params[wkey])
        a = jnp.asarray(params[mod + _A], jnp.float32)
        b = jnp.asarray(params[mod + _B], jnp.float32)
        wf = jnp.asarray(w, jnp.float32) if not isinstance(w, jax.Array) else w.astype(jnp.float32)
        delta = jnp.matmul(b, a, preferred_element_type=jnp.float32)
        if wf.ndim == 4:  # 1x1 conv base (O, I, 1, 1)
            delta = delta[:, :, None, None]
        merged = wf + delta
        out[wkey] = merged.astype(jnp.asarray(w).dtype)
        del out[mod + _A], out[mod + _B]
    return out


def strip_lora(params: Mapping[str, Any]) -> dict:
    """Remove adapter leaves without merging (back to the pristine base)."""
    params = _store(params)
    return {k: v for k, v in params.items() if not (k.endswith(_A) or k.endswith(_B))}


def save_lora(params: Mapping[str, Any], dst, arch: str = "lora") -> str:
    """Write ONLY the adapter tensors to ``dst`` as a GGUF adapter file.

    The file carries ``adapter.type = "lora"`` plus the architecture name,
    and loads back with ``load_lora``. Typical fine-tune artifact: a few
    MB against a multi-hundred-MB base model.
    """
    params = _store(params)
    import os

    from .core.gguf import GGUFWriter

    mods = lora_modules(params)
    if not mods:
        raise_error("save_lora: no LoRA adapters in params")
    w = GGUFWriter(os.fspath(dst), arch)
    w.add("adapter.type", "lora")
    for mod in mods:
        for suffix in (_A, _B):
            v = params[mod + suffix]
            if isinstance(v, jax.Array):
                v = np.asarray(jax.device_get(v.astype(jnp.float32)))
            w.add_tensor(mod + suffix, np.asarray(v, np.float32))
    w.write()
    return os.fspath(dst)


def load_lora(params: Mapping[str, Any], src) -> dict:
    """Attach adapters from a ``save_lora`` file to a base param dict.

    Validates that every adapter's base weight exists and the shapes agree
    (catching a rank-0 file applied to the wrong model). Returns a new
    dict; apply ``merge_lora`` afterwards for zero-overhead inference, or
    leave unmerged to keep fine-tuning.
    """
    params = _store(params)
    from .core.gguf import GGUFFile

    f = src if isinstance(src, GGUFFile) else GGUFFile(src)
    if f.metadata.get("adapter.type") != "lora":
        raise_error("load_lora: '{}' is not a LoRA adapter file", getattr(f, "path", src))
    out = dict(params)
    seen = set()
    for name in f.tensors:
        if not (name.endswith(_A) or name.endswith(_B)):
            raise_error("load_lora: unexpected tensor '{}' in adapter file", name)
        mod = name[: -len(_A)]
        wkey = mod + ".weight"
        if wkey not in params:
            raise_error("load_lora: adapter '{}' has no base weight '{}'", mod, wkey)
        t = np.asarray(f.tensor(name, np.float32))
        base = jnp.shape(_dense(params[wkey]))
        want = (t.shape[1],) if name.endswith(_A) else (t.shape[0],)
        got = (base[1],) if name.endswith(_A) else (base[0],)
        if want != got:
            raise_error(
                "load_lora: '{}' shape {} does not match base weight {} of '{}'",
                name, t.shape, tuple(base), wkey,
            )
        out[name] = t
        seen.add(mod)
    for mod in seen:
        if mod + _A not in out or mod + _B not in out:
            raise_error("load_lora: adapter pair for '{}' is incomplete", mod)
    return out

"""GGUF -> device weights with on-the-fly conversion.

TPU-native equivalent of the reference's model_weights + model_transfer
(src/visp/ml.cpp:283-526): the reference casts F16<->F32 through a tiny ggml
cast graph and permutes WHCN->CWHN conv weights driven by the
``{arch}.conv2d_weights`` GGUF index list. Here:

  * all tensors are returned in **torch-canonical shapes** — conv (O,I,H,W),
    depthwise (C,1,H,W), conv-transpose (I,O,H,W), linear (O,I) — keyed by
    their dotted GGUF names. Files written with ``tensor_data_layout=cwhn``
    (kernels pre-permuted by the reference's scripts/convert.py:117-129) are
    un-permuted back at load so model code sees one layout.
  * float tensors are cast to the device float policy (bf16 on TPU);
    integer tensors (index tables) stay as-is.
  * ``jax.device_put`` uploads everything in one batch (the H2D boundary of
    reference ml.cpp:449-503); an optional ``jax.sharding.NamedSharding`` per
    tensor supports multi-chip replication/sharding.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .device import Device
from .errors import raise_error
from .gguf import GGUFFile
from .quant import _CONV_KERNEL_SIZES, QuantResident, is_quant

__all__ = ["load_weights", "cast_float_params", "is_conv_2d_name", "unpermute_cwhn"]


def cast_float_params(params: dict, dtype) -> dict:
    """Cast floating-point array leaves to the device float policy.

    ``load_weights`` already returns policy-cast tensors, so on the loader
    path this is a no-op; model constructors call it so DIRECT construction
    (random/test weights, torch exports — always f32) also matches the
    dtype the jitted programs cast their inputs to. Reference analog: the
    F16<->F32 tensor_converter every weight passes through on upload
    (ml.cpp:352-397). Integer tensors (index tables) and quantized-resident
    leaves (core/quant.QuantResident) pass through untouched.
    """
    out = {}
    for k, v in params.items():
        if isinstance(v, (np.ndarray, jax.Array)) and jnp.issubdtype(v.dtype, jnp.floating):
            if v.dtype != dtype:
                v = jnp.asarray(v, dtype) if isinstance(v, jax.Array) else np.asarray(v).astype(dtype)
        out[k] = v
    return out


def is_conv_2d_name(name: str, shape: tuple[int, ...]) -> bool:
    """Heuristic matching the reference converter's is_conv_2d
    (scripts/convert.py:110-117): 4D, square small kernel, '.weight' name."""
    return (
        len(shape) == 4
        and shape[2] == shape[3]
        and shape[2] in _CONV_KERNEL_SIZES
        and name.endswith("weight")
    )


def unpermute_cwhn(name: str, a: np.ndarray, trusted: bool = False) -> np.ndarray:
    """Invert the converter's conv_2d_to_nhwc permute for 'cwhn' files.

    Stored normal conv: (O,H,W,I) -> torch (O,I,H,W).
    Stored depthwise:   (H,W,1,C) -> torch (C,1,H,W).
    Non-conv 4D tensors pass through unchanged.

    ``trusted``: the file's {arch}.conv2d_weights list names this tensor,
    so it WAS permuted by the converter — the kernel-size heuristic must
    not veto the un-permute (an exotic kernel like 5x5 would otherwise
    load mis-laid-out with no error); only the depthwise-vs-normal shape
    disambiguation still applies.
    """
    if trusted:
        if a.ndim != 4:
            raise_error("conv2d_weights names non-4D tensor '{}' ({}D)", name, a.ndim)
        s = a.shape
        if s[2] == 1 and s[0] == s[1]:  # depthwise (H,W,1,C)
            return np.ascontiguousarray(a.transpose(3, 2, 0, 1))
        return np.ascontiguousarray(a.transpose(0, 3, 1, 2))
    if a.ndim != 4 or not name.endswith("weight"):
        return a
    s = a.shape
    # depthwise candidate: (H,W,1,C) with square small H==W
    if s[2] == 1 and s[0] == s[1] and s[0] in _CONV_KERNEL_SIZES:
        return np.ascontiguousarray(a.transpose(3, 2, 0, 1))
    # normal candidate: (O,H,W,I) with square small H==W
    if s[1] == s[2] and s[1] in _CONV_KERNEL_SIZES:
        return np.ascontiguousarray(a.transpose(0, 3, 1, 2))
    return a


def load_weights(
    file: GGUFFile,
    device: Device | None = None,
    float_dtype: Any | None = None,
    shardings: Mapping[str, jax.sharding.Sharding] | None = None,
    as_numpy: bool = False,
    keep_quantized: bool = False,
) -> dict[str, Any]:
    """Read all tensors, normalize layout, cast floats, upload to device.

    Mirrors reference model_transfer (ml.cpp:449-516) in one pass. With
    ``keep_quantized`` block-quantized tensors stay as int8 levels +
    per-block scales (core/quant.QuantResident) and dequantize inside the
    graph at use — the ggml compute-from-quantized analog; ~1.8x less HBM,
    bit-identical numerics.
    """
    if float_dtype is None:
        float_dtype = device.preferred_float_type if device is not None else jnp.float32
    layout = file.tensor_layout
    # {arch}.conv2d_weights is authoritative WHEN PRESENT (reference
    # ml.cpp:435-445): those tensor indices are the permuted convs. The
    # reference converter only emits it for whcn files, so cwhn files
    # normally fall back to the shape heuristic (unpermute_cwhn).
    conv_names = None
    idx_list = file.conv2d_weight_indices()
    if idx_list:
        names_in_order = list(file.tensor_names())
        bad = [i for i in idx_list if not 0 <= i < len(names_in_order)]
        if bad:
            raise_error(
                "conv2d_weights index {} out of range (file has {} tensors)",
                bad[0], len(names_in_order),
            )
        conv_names = {names_in_order[i] for i in idx_list}
    out: dict[str, Any] = {}
    for name in file.tensor_names():
        if keep_quantized and file.is_quantized(name):
            # K-quants have no int8-residency decomposition (gguf.py
            # _RESIDENT_TYPES) -> blocks is None and the tensor expands below
            blocks = file.tensor_quant_blocks(name)
            if blocks is not None:
                q, scale, minv = blocks
                r = QuantResident(
                    q, scale, minv, tuple(file.tensors[name].shape), None,
                    str(np.dtype(float_dtype)),
                )
                # same authority rule as the dense path below: a present
                # conv2d_weights list overrides the shape heuristic
                if layout == "cwhn" and (conv_names is None or name in conv_names):
                    r = r.unpermute_cwhn(name, trusted=conv_names is not None)
                out[name] = r
                continue
        a = file.tensor(name)
        if layout == "cwhn" and (conv_names is None or name in conv_names):
            a = unpermute_cwhn(name, a, trusted=conv_names is not None)
        if np.issubdtype(a.dtype, np.floating):
            # copy=False keeps already-matching tensors as zero-copy mmap
            # views instead of a full extra host pass over the weights
            target = np.float32 if np.dtype(float_dtype) == np.dtype("bfloat16") else np.dtype(float_dtype)
            a = a.astype(target, copy=False)
        out[name] = a
    if as_numpy:
        # (bf16 floats were already delivered as f32 above: numpy has no bf16)
        return out
    dev = device.jax_device if device is not None else None
    result: dict[str, Any] = {}
    for name, a in out.items():
        target = shardings.get(name) if shardings else None
        if target is None and dev is not None:
            target = dev
        if is_quant(a):
            result[name] = a.put(target) if target is not None else a.put()
            continue
        arr = jax.device_put(a, target) if target is not None else jnp.asarray(a)
        if np.issubdtype(np.asarray(a).dtype, np.floating) and np.dtype(float_dtype) == np.dtype("bfloat16"):
            arr = arr.astype(jnp.bfloat16)
        result[name] = arr
    return result

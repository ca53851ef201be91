"""Quantized weight residency — compute-from-quantized, the TPU way.

The reference's ggml runtime computes DIRECTLY from quantized blocks: a
Q8_0 model stays ~1 byte/element in memory and every matmul dequantizes
tiles on the fly (ggml-quants.c; model load keeps the file's ggml_type,
src/visp/ml.cpp:283-360). The repo's round-1/2 loader instead expanded
quantized tensors to bf16 at load — correct, but double the HBM.

This module closes that gap TPU-first: quantized tensors stay on device as
``int8 levels + per-block f32 scales`` (~1.125 B/elem vs 2 for bf16) and
the dequant — cast, scale multiply (+ block min add), reshape, layout
permute — is emitted INSIDE the jitted graph at each use, where XLA fuses
it into the consumer. Numerics are bit-identical to load-time dequant:
the same f32 multiply and the same round-to-nearest bf16 cast, just moved
from host to graph.

``Params.find`` (core/params.py) dequantizes transparently, so model code
is unchanged; model loaders only need the ``QuantResident.put`` branch
when uploading. Seven GGUF block formats reduce exactly to this form:
the five legacy 32-block ones (Q4/Q5 levels fit int8; affine variants
carry ``minv``) plus IQ4_NL/IQ4_XS, whose non-linear grid VALUES are int8
and whose scales are per-32 (gguf.py ``_RESIDENT_TYPES``). K-quants expand
at load instead.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["QuantResident", "is_quant", "quantize_resident", "quantize_store", "store_nbytes"]

_BLOCK = 32
# canonical conv-kernel-size set for the is_conv_2d shape heuristic
# (reference convert.py:110-117); weights.py and convert/convert.py import
# it from here so the three layout paths can never desync
_CONV_KERNEL_SIZES = (1, 3, 4, 7, 14)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class QuantResident:
    """A block-quantized tensor living on device in integer form.

    ``q``: int8 levels, flat ``(n,)`` in FILE-layout C order.
    ``scale``: f32 ``(n // 32,)`` per-block scales.
    ``minv``: f32 per-block minimums for affine formats (Q4_1/Q5_1), or None.
    ``file_shape``: C-order shape the flat data reshapes to.
    ``permute``: transpose applied after reshape (cwhn un-permute), or None.
    ``dtype``: target dtype name the dequant casts to (e.g. "bfloat16").
    """

    q: Any
    scale: Any
    minv: Any
    file_shape: tuple
    permute: tuple | None
    dtype: str

    # -- pytree protocol: arrays are children, layout/dtype is static --
    def tree_flatten(self):
        return (self.q, self.scale, self.minv), (self.file_shape, self.permute, self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scale, minv = children
        file_shape, permute, dtype = aux
        return cls(q, scale, minv, file_shape, permute, dtype)

    # -- array-like surface so shape-sniffing code works untouched --
    @property
    def shape(self) -> tuple:
        if self.permute is None:
            return self.file_shape
        return tuple(self.file_shape[i] for i in self.permute)

    @property
    def ndim(self) -> int:
        return len(self.file_shape)

    @property
    def nbytes(self) -> int:
        # .size is metadata on both numpy and jax arrays (no D2H)
        n = int(self.q.size) + 4 * int(self.scale.size)
        if self.minv is not None:
            n += 4 * int(self.minv.size)
        return n

    def dequant(self):
        """Emit the dequant expression (traced when called under jit)."""
        v = jnp.asarray(self.q).reshape(-1, _BLOCK).astype(jnp.float32)
        v = v * jnp.asarray(self.scale)[:, None]
        if self.minv is not None:
            v = v + jnp.asarray(self.minv)[:, None]
        v = v.reshape(self.file_shape)
        if self.permute is not None:
            v = jnp.transpose(v, self.permute)
        return v.astype(self.dtype)

    def astype(self, dtype) -> "QuantResident":
        """Retarget the dequant dtype (cheap: metadata only)."""
        return replace(self, dtype=str(np.dtype(dtype)))

    def put(self, device=None) -> "QuantResident":
        """Upload the integer payload to ``device`` (a jax.Device/sharding)."""
        minv = None if self.minv is None else jax.device_put(self.minv, device)
        return replace(
            self,
            q=jax.device_put(np.ascontiguousarray(self.q), device),
            scale=jax.device_put(self.scale, device),
            minv=minv,
        )

    def unpermute_cwhn(self, name: str, trusted: bool = False) -> "QuantResident":
        """Resident analog of weights.unpermute_cwhn (same shape heuristics;
        ``trusted`` = named by the file's conv2d_weights list, which
        overrides the kernel-size gate)."""
        s = self.file_shape
        if self.permute is not None:
            return self
        if trusted:
            if len(s) != 4:
                from .errors import raise_error

                raise_error("conv2d_weights names non-4D tensor '{}' ({}D)", name, len(s))
            if s[2] == 1 and s[0] == s[1]:
                return replace(self, permute=(3, 2, 0, 1))  # (H,W,1,C) -> (C,1,H,W)
            return replace(self, permute=(0, 3, 1, 2))  # (O,H,W,I) -> (O,I,H,W)
        if len(s) != 4 or not name.endswith("weight"):
            return self
        if s[2] == 1 and s[0] == s[1] and s[0] in _CONV_KERNEL_SIZES:
            return replace(self, permute=(3, 2, 0, 1))  # (H,W,1,C) -> (C,1,H,W)
        if s[1] == s[2] and s[1] in _CONV_KERNEL_SIZES:
            return replace(self, permute=(0, 3, 1, 2))  # (O,H,W,I) -> (O,I,H,W)
        return self


def is_quant(v: Any) -> bool:
    return isinstance(v, QuantResident)


def quantize_resident(a: np.ndarray, dtype: str = "bfloat16") -> QuantResident:
    """Q8_0-style absmax quantization of a float array into residency form.

    Serving lever: halves ANY model's device footprint at load with no file
    change (the file-side analog is the converter's quantized output).
    """
    from .gguf import q8_0_block_levels

    a = np.asarray(a, np.float32)
    q, scale = q8_0_block_levels(a)  # raises on a non-multiple-of-32 size
    return QuantResident(q.reshape(-1), scale, None, tuple(a.shape), None, dtype)


def quantize_store(
    params: dict, dtype: str = "bfloat16", min_elements: int = 4096, skip=("positional",)
) -> dict:
    """Quantize every large float tensor of a parameter store in memory."""
    out = {}
    for k, v in params.items():
        # eligibility from METADATA only (dtype/size/shape exist on both
        # numpy and jax arrays) — np.asarray on a device-resident bf16
        # array is a pathological D2H transfer (CLAUDE.md), and doing it
        # per check turned this into minutes per model over the tunnel
        dt = np.dtype(getattr(v, "dtype", np.dtype("O")))
        # np.issubdtype(bfloat16, floating) is False (ml_dtypes registers
        # kind 'V'), so bf16 device arrays — the common case after a TPU
        # load — need the explicit name check
        eligible = (
            not is_quant(v)
            and (np.issubdtype(dt, np.floating) or dt.name == "bfloat16")
            and getattr(v, "size", 0) >= min_elements
            and v.size % _BLOCK == 0
            and not any(s in k for s in skip)
        )
        if eligible:
            a = v
            if not isinstance(a, np.ndarray):
                # ONE transfer, cast to f32 on device first (bf16 D2H is the
                # slow path)
                import jax.numpy as jnp

                a = np.asarray(a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a)
            out[k] = quantize_resident(np.asarray(a, np.float32), dtype)
        else:
            out[k] = v
    return out


def store_nbytes(params: dict) -> int:
    """Device-resident bytes of a parameter store (arrays + residents).

    Uses the array's own ``nbytes`` when present — never ``np.asarray`` on
    a device array (that is a D2H transfer, pathological over the tunnel).
    """
    total = 0
    for v in params.values():
        if is_quant(v):
            total += v.nbytes
        elif hasattr(v, "nbytes"):
            total += int(v.nbytes)
        else:
            total += int(np.asarray(v).nbytes)
    return total

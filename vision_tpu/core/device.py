"""Backend device policy — TPU-native equivalent of the reference backend layer.

Reference (src/visp/ml.cpp:16-201, include/visp/ml.h:30-80) enumerates ggml
backends, picks the "best", and exposes per-backend policy: preferred float
type (F32 cpu / F16 gpu), preferred memory layout (CWHN cpu / keep-model
layout gpu), max allocation size, thread count, and a set of build flags that
alter graph construction (flash attention, fused concat, window partition...).

TPU-native redesign:
  * devices come from ``jax.devices()``; "best" = TPU > GPU > CPU.
  * preferred float type is **bfloat16** on TPU (MXU-native), float32 on CPU.
  * there is exactly ONE activation layout: **NHWC** (TPU/XLA-native for
    convolutions). The reference's WHCN/CWHN dual-layout machinery collapses
    away; GGUF files that store WHCN conv weights are permuted at load time
    (see core/weights.py), mirroring ml.cpp:459-502.
  * ``max_alloc`` becomes an HBM-size query used for dynamic-resolution
    clamping (BiRefNet), replacing the reference's Vulkan 4 GiB heuristic.
  * build flags survive as jit options: flash vs naive attention (env
    ``VISP_FLASH_ATTENTION`` kept, ml.cpp:167-175), pallas kernel toggles.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace
from enum import Flag, auto
from functools import lru_cache

import jax
import jax.numpy as jnp

__all__ = [
    "BackendType",
    "BuildFlag",
    "Device",
    "backend_init",
    "backend_is_available",
]


class BackendType(Flag):
    cpu = auto()
    tpu = auto()
    gpu = auto()


class BuildFlag(Flag):
    """Graph-construction options (reference model_build_flag, ml.h:69-76)."""

    none = 0
    flash_attention = auto()  # use fused (pallas) attention kernel
    pallas = auto()  # enable custom pallas kernels on the hot path
    donate_input = auto()  # donate input buffers to jit
    deform_shift = auto()  # gather-free bounded-offset deformable conv
    keep_quantized = auto()  # quantized weights stay int8-resident (core/quant.py)


_FLAG_ENVS = (
    ("VISP_FLASH_ATTENTION", BuildFlag.flash_attention),
    ("VISP_PALLAS", BuildFlag.pallas),
    ("VISP_DEFORM_SHIFT", BuildFlag.deform_shift),
    ("VISP_KEEP_QUANT", BuildFlag.keep_quantized),
)


_FALSY_ENV = ("", "0", "off", "false", "no")


def _env_truthy(v: str) -> bool:
    # case-insensitive: 'OFF'/'False'/'no' must disable, not force-enable
    return v.strip().lower() not in _FALSY_ENV


def _flag_env(flags: BuildFlag) -> BuildFlag:
    """Apply env overrides, mirroring VISP_FLASH_ATTENTION (ml.cpp:167-175)."""
    for env, flag in _FLAG_ENVS:
        v = os.environ.get(env)
        if v is None:
            continue
        if _env_truthy(v):
            flags |= flag
        else:
            flags &= ~flag
    return flags


def backend_default_flags(btype: BackendType) -> BuildFlag:
    if btype & BackendType.tpu:
        return _flag_env(
            BuildFlag.flash_attention | BuildFlag.pallas | BuildFlag.deform_shift
        )
    return _flag_env(BuildFlag.none)


@dataclass(frozen=True)
class Device:
    """Compute device + dtype policy (reference backend_device, ml.h:44-55)."""

    jax_device: jax.Device
    type: BackendType
    flags: BuildFlag = BuildFlag.none

    @property
    def preferred_float_type(self) -> jnp.dtype:
        # bf16 on TPU/GPU accelerators (MXU-native), f32 on CPU — mirrors the
        # reference's F16-on-GPU / F32-on-CPU policy (ml.cpp:97-109).
        if self.type & (BackendType.tpu | BackendType.gpu):
            return jnp.bfloat16
        return jnp.float32

    @property
    def total_memory(self) -> int:
        stats = getattr(self.jax_device, "memory_stats", lambda: None)()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
        # CPU host: treat as effectively unbounded (64 GiB placeholder).
        return 64 << 30

    @property
    def max_alloc(self) -> int:
        """Largest single allocation we plan for — used by dynamic-resolution
        clamping (reference birefnet.cpp:288-305 uses Vulkan max_alloc)."""
        return self.total_memory // 4

    def with_flags(self, flags: BuildFlag) -> "Device":
        return replace(self, flags=flags)


def backend_is_available(btype: BackendType) -> bool:
    if btype == BackendType.cpu:
        # the CPU backend always exists; answering without jax.devices()
        # matters because device enumeration initializes EVERY registered
        # plugin (the TPU tunnel stall backend_init(cpu) exists to avoid)
        # and would forfeit a later CPU pin in this process
        return True
    try:
        if any(_classify(d) & btype for d in jax.devices()):
            return True
        if btype & BackendType.cpu:
            # accelerator platforms hide the CPU backend from the default
            # enumeration, but it always exists
            return bool(jax.devices("cpu"))
        return False
    except RuntimeError:
        return False


def _classify(d: jax.Device) -> BackendType:
    p = d.platform.lower()
    if p == "tpu" or "tpu" in str(getattr(d, "device_kind", "")).lower():
        return BackendType.tpu
    if p in ("gpu", "cuda", "rocm"):
        return BackendType.gpu
    return BackendType.cpu


_cpu_pinned = False


@lru_cache(maxsize=None)
def _all_devices():
    return tuple(jax.devices())


def backend_init(btype: BackendType | str | None = None) -> Device:
    """Pick the best available device (reference backend_init, ml.cpp:59-95).

    Order of preference: TPU > GPU > CPU, or the first device matching
    ``btype`` when given (a :class:`BackendType` or its name, e.g. ``"cpu"``).

    Debug env vars (the analog of the reference's assert/ASan build modes,
    CMakeLists.txt:41-65): ``VISP_DEBUG_NANS=1`` enables jax_debug_nans so
    any NaN produced inside a jitted program raises at the faulting op.

    ``VISP_COMPILE_CACHE=<dir>`` enables JAX's persistent compilation cache:
    compiled programs for each (model, shape-bucket) are written to disk and
    reused across processes, so a serving cold start skips the multi-minute
    first compile (the reference's "< 100 ms init" story — ml.cpp builds
    graphs in milliseconds, XLA does not; the cache is the TPU answer).
    """
    if isinstance(btype, str):
        try:
            btype = BackendType[btype.lower()]
        except KeyError:
            from .errors import raise_error

            raise_error(
                "backend_init: unknown backend '{}' (expected one of {})",
                btype,
                "/".join(t.name for t in BackendType),
            )
    _nans = os.environ.get("VISP_DEBUG_NANS")
    if _nans is not None and _env_truthy(_nans):
        jax.config.update("jax_debug_nans", True)
    cache_dir = os.environ.get("VISP_COMPILE_CACHE")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every program regardless of compile time or size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    elif cache_dir is None and jax.config.jax_compilation_cache_dir is None:
        # Persistent compile cache ON BY DEFAULT for production entry
        # points (CLI, serving, training): big-model compiles run minutes
        # over the remote-compile tunnel (NOTES.md: a cold serving warmup
        # rode a degraded phase for ~25 min) and the cache makes them a
        # one-time cost. VISP_COMPILE_CACHE=<path> overrides the location,
        # VISP_COMPILE_CACHE= (empty) disables; an application that already
        # configured jax_compilation_cache_dir (tests' conftest, bench.py)
        # keeps its own setting. Entries are HLO-hash keyed per platform,
        # so CPU/TPU programs never collide. Size is bounded by wholesale
        # reset at 8 GB rather than jax_compilation_cache_max_size: jax's
        # LRU eviction races its own -atime bookkeeping (FileNotFoundError
        # inside put()), which silently drops the writes of exactly the
        # multi-minute programs the cache exists for (observed with the
        # finetune fwd+bwd steps).
        _default_cache = os.path.join(
            os.path.expanduser("~"), ".cache", "vision_tpu", "xla"
        )
        try:
            os.makedirs(_default_cache, exist_ok=True)
            _size = sum(
                os.path.getsize(os.path.join(_default_cache, f))
                for f in os.listdir(_default_cache)
                if os.path.isfile(os.path.join(_default_cache, f))
            )
            if _size > 8 * 1024**3:
                import shutil

                shutil.rmtree(_default_cache)
                os.makedirs(_default_cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", _default_cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except OSError:
            pass  # read-only home: run without a persistent cache
    if btype == BackendType.cpu:
        # an explicit CPU request must not initialize accelerator platforms:
        # device enumeration would connect to the TPU (over a tunnel here,
        # where a fresh process can stall minutes on connection setup —
        # NOTES.md), which a CPU-only embedding (C ABI, tests, converters)
        # should never pay for. Pinning jax_platforms is the only mechanism
        # that actually prevents plugin initialization (jax.devices("cpu")
        # still initializes every registered platform), so the FIRST
        # backend_init(cpu) in a process pins it to CPU; a later request
        # for an accelerator in the same process gets a clear error.
        global _cpu_pinned
        try:
            import jax._src.xla_bridge as _xb

            uninitialized = not _xb._backends
        except Exception:
            # fail CLOSED: if a jax upgrade moves the private probe, assume
            # uninitialized and pin anyway — the cost of a wrong pin is a
            # clear error on a later accelerator request, while silently
            # skipping the pin re-introduces the multi-minute tunnel stall
            import warnings

            warnings.warn(
                "backend_init(cpu): could not probe jax backend state; "
                "pinning jax_platforms=cpu defensively", RuntimeWarning,
                stacklevel=2,
            )
            uninitialized = True
        if uninitialized:
            jax.config.update("jax_platforms", "cpu")
            _cpu_pinned = True
    devices = _all_devices()
    classified = [(d, _classify(d)) for d in devices]
    if btype is not None:
        for d, t in classified:
            if t & btype:
                return Device(d, t, backend_default_flags(t))
        if btype == BackendType.cpu:
            # an accelerator is jax's default platform, so the default
            # enumeration hides the CPU backend — once platforms are up,
            # asking for it explicitly is free (no tunnel contact)
            try:
                for d in jax.devices("cpu"):
                    return Device(d, BackendType.cpu, backend_default_flags(BackendType.cpu))
            except RuntimeError:
                pass
        from .errors import raise_error

        if _cpu_pinned and btype != BackendType.cpu:
            raise_error(
                "no backend device available for type {} (this process was "
                "pinned to CPU by an earlier backend_init(cpu); initialize "
                "the accelerator backend first)", btype,
            )
        raise_error("no backend device available for type {}", btype)
    for want in (BackendType.tpu, BackendType.gpu, BackendType.cpu):
        for d, t in classified:
            if t & want:
                return Device(d, t, backend_default_flags(t))
    from .errors import raise_error

    raise_error("no jax devices available")

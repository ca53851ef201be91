"""Multi-chip scaling via jax.sharding over a device mesh.

The reference is a single-process, single-device engine (SURVEY.md §2.8 —
no NCCL/MPI/DP/TP anywhere); the distributed axis of this framework is
defined TPU-natively: shard the batch (images / tiles) over a ``dp`` mesh
axis and optionally shard wide weights over a ``tp`` axis, and let XLA
insert the collectives (psum for dp gradient/activation reductions,
all-gather for tp outputs) over ICI.

Design:
  * ``make_mesh(n, tp, sp, pp)`` — (dp, pp, sp, tp) mesh over the
    available devices (sp = sequence/spatial parallelism of a single
    image's tokens; pp = pipeline stages, see parallel.pipeline; dp/tp
    as usual; all extra axes default to size 1).
  * ``shard_params`` — apply name-pattern rules mapping dotted GGUF names
    to PartitionSpecs; everything else is replicated. The default rules
    shard the big attention/MLP projection matrices over ``tp``.
  * ``sharded_forward`` / ``training_step`` — jit with explicit
    in/out shardings; the training step (forward + grad + SGD update)
    exists to validate the full collective pattern (dp grad psum + tp
    weight updates) end-to-end, and doubles as the multi-chip dry-run
    entrypoint.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "DEFAULT_TP_RULES",
    "SAM3_TP_RULES",
    "init_distributed",
    "make_mesh",
    "replicate",
    "batch_sharding",
    "shard_params",
    "sharded_forward",
    "training_step",
]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Multi-HOST initialization: call once per host process before any
    other JAX use, then build meshes as usual — ``jax.devices()`` returns
    the GLOBAL device list afterwards, so ``make_mesh`` spans the pod.

    On a TPU pod slice all arguments auto-detect from the environment
    (``jax.distributed.initialize()``); pass them explicitly elsewhere.
    Lay out the mesh so the fast collectives stay inside a host/slice:
    tp/sp innermost (ICI), dp outermost (DCN-tolerant — one gradient/
    batch collective per step). Single-host single-process use never
    needs this; it exists so the serving/mesh story scales to multi-host
    pods without touching model code. Idempotent: once the distributed
    client exists, any further call returns without touching it —
    INCLUDING calls with different settings (re-configuring a live
    process is not supported; restart the process to change clusters).
    """
    import jax

    state = getattr(jax._src.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)

# Default tensor-parallel rules: dotted-name regex -> PartitionSpec.
# Linear weights are torch-canonical (out, in): column-parallel shards dim 0,
# row-parallel shards dim 1.
DEFAULT_TP_RULES: tuple[tuple[str, P], ...] = (
    (r".*\bqkv\.weight$", P("tp", None)),
    (r".*\bqkv\.bias$", P("tp")),
    (r".*\b(fc1|lin1)\.weight$", P("tp", None)),
    (r".*\b(fc1|lin1)\.bias$", P("tp")),
    (r".*\b(fc2|lin2)\.weight$", P(None, "tp")),
    (r".*\bproj\.weight$", P(None, "tp")),
    # HF split-projection naming (DINOv2 / depth-anything backbones):
    # column-parallel q/k/v, row-parallel output.dense
    (r".*\battention\.(query|key|value)\.weight$", P("tp", None)),
    (r".*\battention\.(query|key|value)\.bias$", P("tp")),
    (r".*\battention\.output\.dense\.weight$", P(None, "tp")),
)

# SAM3 uses split q/k/v projections (sam3.h attention naming) instead of a
# fused qkv; column-parallel q/k/v + fc1, row-parallel o_proj (fc2 is
# covered by the default rule). XLA inserts the psum after the
# row-parallel matmuls — Megatron-style tp without manual collectives.
SAM3_TP_RULES: tuple[tuple[str, P], ...] = DEFAULT_TP_RULES + (
    (r".*\b(q_proj|k_proj|v_proj)\.weight$", P("tp", None)),
    (r".*\b(q_proj|k_proj|v_proj)\.bias$", P("tp")),
    (r".*\bo_proj\.weight$", P(None, "tp")),
)


def make_mesh(
    n_devices: int | None = None, tp: int = 1, sp: int = 1, pp: int = 1, devices=None
) -> Mesh:
    """Create a (dp, pp, sp, tp) mesh. dp = n_devices // (pp * sp * tp).

    ``sp`` is the sequence/spatial-parallel axis: models that support it
    (SAM3's window-major trunk) shard the token/window axis of a SINGLE
    image over it — the latency lever dp (more images) and tp (wider
    layers) cannot provide. ``pp`` is the pipeline axis (parallel.pipeline):
    trunk stages shard over it, the axis that scales models LARGER than a
    chip's HBM. Axis order puts tp innermost so tensor-parallel collectives
    ride nearest-neighbour ICI links, then sp, then pp (stage handoffs are
    small and infrequent), dp outermost. All extra axes default to size 1,
    so existing (dp, tp) call sites are unchanged (PartitionSpecs name
    axes; an extra size-1 axis is invisible to them).
    """
    from ..core.errors import raise_error

    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices < 1 or tp < 1 or sp < 1 or pp < 1:
        raise_error(
            "make_mesh: need n_devices >= 1 and tp/sp/pp >= 1, got {} / {} / {} / {}",
            n_devices, tp, sp, pp,
        )
    if n_devices > len(devices):
        raise_error("make_mesh: need {} devices, have {}", n_devices, len(devices))
    if n_devices % (pp * sp * tp):
        raise_error(
            "make_mesh: n_devices {} not divisible by pp {} * sp {} * tp {}",
            n_devices, pp, sp, tp,
        )
    devices = np.asarray(devices[:n_devices]).reshape(n_devices // (pp * sp * tp), pp, sp, tp)
    return Mesh(devices, ("dp", "pp", "sp", "tp"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp."""
    return NamedSharding(mesh, P("dp"))


def shard_params(
    params: Mapping[str, Any],
    mesh: Mesh,
    rules: Sequence[tuple[str, P]] = DEFAULT_TP_RULES,
) -> dict[str, jax.Array]:
    """Place parameters on the mesh: rule-matched tensors are tp-sharded
    (when divisible), the rest replicated."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]
    tp_size = mesh.shape["tp"]
    out = {}
    for name, value in params.items():
        spec = P()
        if tp_size > 1:
            for pat, s in compiled:
                if pat.match(name):
                    # only shard when the dimension divides evenly
                    dims = np.shape(value)
                    ok = all(
                        ax is None or (i < len(dims) and dims[i] % tp_size == 0)
                        for i, ax in enumerate(s)
                    )
                    if ok:
                        spec = s
                    break
        out[name] = jax.device_put(value, NamedSharding(mesh, spec))
    return out


def sharded_forward(fn: Callable, mesh: Mesh) -> Callable:
    """jit ``fn(params, x)`` with batch sharded over dp; params keep their
    placement (replicated or tp-sharded)."""
    return jax.jit(fn, in_shardings=(None, batch_sharding(mesh)), out_shardings=batch_sharding(mesh))


def training_step(loss_fn: Callable, mesh: Mesh, lr: float = 1e-3) -> Callable:
    """Build a jitted SGD step: grads of ``loss_fn(params, batch)`` w.r.t.
    params, dp-mean'd by XLA (psum over the dp axis happens automatically
    from the batch sharding), applied in-place.

    Used by the multi-chip dry-run to validate that the full dp x tp
    collective pattern compiles and executes.
    """

    def step(params, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        new_params = jax.tree_util.tree_map(
            lambda p, g: (p - lr * g.astype(p.dtype)) if jnp.issubdtype(p.dtype, jnp.floating) else p,
            params,
            grads,
        )
        return loss, new_params

    return jax.jit(step, in_shardings=(None, batch_sharding(mesh)), donate_argnums=(0,))

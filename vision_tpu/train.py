"""Training / fine-tuning on device meshes, with checkpoint/resume.

The reference is inference-only (SURVEY.md §2 has no training rows); this
module is a north-star extra that makes the framework production-complete:
an optax train step jitted over the same (dp, pp, sp, tp) meshes the
inference paths use, gradient accumulation for HBM-bound batches, and
orbax checkpoint/resume so long runs survive preemption (the real form of
SURVEY §5's checkpoint/resume row — the inference side's analog is the
persistent compile cache).

TPU-first design notes:
  * ONE jitted step per configuration: ``value_and_grad`` + optax update
    with the TrainState donated — params and optimizer slots update
    in-place in HBM, no extra copy.  The batch is dp-sharded; XLA inserts
    the dp gradient psum and any tp collectives from the param shardings
    alone (same mechanism as inference, no manual collectives).
  * Gradient accumulation is a ``lax.scan`` over a static microbatch axis
    — compiles once, runs as one program, grads accumulate in f32.
  * Fine-tuning: a ``trainable`` name-predicate partitions the flat
    param dict; frozen leaves (and any non-float buffer) are closed over
    untouched, so ``jax.grad`` never sees them.
  * Mixed precision is the loss_fn's business (cast to bf16 inside,
    ``jax.checkpoint`` remat likewise); params stay the dtype the caller
    placed (f32 master weights recommended, updates are applied in f32
    and cast back by optax).

Checkpoint layout: one orbax StandardCheckpointer directory per save —
restores are sharding-aware (arrays land back on the template's mesh
placement) and bit-exact (tested in tests/test_train.py).
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, Mapping, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .parallel.sharding import DEFAULT_TP_RULES, batch_sharding, shard_params

__all__ = [
    "TrainState",
    "create_train_state",
    "data_loader",
    "ema_update",
    "export_gguf",
    "make_train_step",
    "prefetch_to_device",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
]


class TrainState(NamedTuple):
    """The full mutable state of a training run (a pytree).

    ``params`` is the flat dotted-name dict every model in this framework
    uses (core/params.py); ``opt_state`` covers the TRAINABLE subset only.
    """

    step: jax.Array
    params: dict
    opt_state: Any


def _is_float(v) -> bool:
    from .core.quant import QuantResident

    if isinstance(v, QuantResident):
        # integer-residency base weights are frozen by definition: the
        # optimizer can't step quantized levels. They stay in the param
        # dict (models dequant them at trace time) — QLoRA: adapters
        # train next to the frozen quantized base.
        return False
    return jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)


def _trainable_pred(trainable) -> Callable[[str, Any], bool]:
    """Normalize the ``trainable`` argument to a (name, value) predicate.

    None -> every float leaf; a string -> regex on the dotted name; a
    callable -> used as-is (value passed for dtype checks). Non-float
    leaves are never trainable regardless.
    """
    if trainable is None:
        return lambda name, v: _is_float(v)
    if isinstance(trainable, str):
        pat = re.compile(trainable)
        return lambda name, v: _is_float(v) and bool(pat.search(name))
    return lambda name, v: _is_float(v) and bool(trainable(name, v))


def _split(params: Mapping[str, Any], pred) -> tuple[dict, dict]:
    train = {k: v for k, v in params.items() if pred(k, v)}
    frozen = {k: v for k, v in params.items() if k not in train}
    return train, frozen


def create_train_state(
    params: Mapping[str, Any],
    optimizer,
    mesh=None,
    rules: Sequence = DEFAULT_TP_RULES,
    trainable=None,
    fsdp: bool = False,
    fsdp_min_size: int = 2**16,
) -> TrainState:
    """Place params (tp-sharded on a mesh via the same rules inference
    uses, replicated otherwise) and init the optimizer over the trainable
    subset. Optimizer slots inherit each param's placement (zeros_like of
    a sharded array is sharded the same way).

    ``fsdp=True`` additionally shards every float param that the tp rules
    left replicated — at least ``fsdp_min_size`` elements, leading dim
    divisible by the dp axis — over ``dp`` on its leading dim (ZeRO-3
    style: params AND their optimizer slots live partitioned; XLA
    all-gathers each weight just-in-time for its op and reduce-scatters
    its gradient, from the shardings alone). Per-chip state memory drops
    ~dp-fold for the sharded tensors; the cost is one all-gather per
    weight per step, riding ICI. Numerics are unchanged (parity-tested)."""
    if mesh is not None:
        params = shard_params(params, mesh, rules)
        if fsdp and mesh.shape["dp"] > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = mesh.shape["dp"]
            placed = {}
            for k, v in params.items():
                spec = v.sharding.spec if isinstance(v.sharding, NamedSharding) else None
                replicated = not spec or all(s is None for s in spec)
                if (
                    replicated
                    and jnp.issubdtype(v.dtype, jnp.floating)
                    and v.size >= fsdp_min_size
                    and v.ndim >= 1
                    and v.shape[0] % dp == 0
                ):
                    v = jax.device_put(
                        v, NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1))))
                    )
                placed[k] = v
            params = placed
    else:
        from .core.quant import QuantResident

        params = {
            k: v if isinstance(v, QuantResident) else jnp.asarray(v)
            for k, v in params.items()
        }
    train, _ = _split(params, _trainable_pred(trainable))
    if not train:
        from .core.errors import raise_error

        raise_error("create_train_state: no trainable parameters selected")
    opt_state = optimizer.init(train)
    step = jnp.zeros((), jnp.int32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        step = jax.device_put(step, rep)

        # optimizer.init slots built as zeros_like(param) inherit the
        # param's mesh placement, but fresh scalars (adam's count, ...)
        # land on the default device — mixing the two breaks any later
        # jit over the state (and checkpoint-restore templates). Move
        # every leaf NOT already on this mesh to replicated; leaves on
        # the mesh keep their (possibly tp-sharded) placement.
        def place(x):
            s = getattr(x, "sharding", None)
            if isinstance(s, NamedSharding) and s.mesh == mesh:
                return x
            return jax.device_put(x, rep)

        opt_state = jax.tree_util.tree_map(place, opt_state)
    return TrainState(step=step, params=dict(params), opt_state=opt_state)


def make_train_step(
    loss_fn: Callable,
    optimizer,
    mesh=None,
    accum: int = 1,
    trainable=None,
) -> Callable:
    """Build ``step(state, batch) -> (state, metrics)`` as one jitted,
    state-donating program.

    ``loss_fn(params, batch) -> scalar`` sees the FULL param dict (frozen
    leaves included); gradients flow only into the trainable subset.
    With ``accum > 1`` every batch leaf carries a leading microbatch axis
    of that size — the step scans over it, accumulating grads in f32, and
    applies one update of the mean gradient (exactly equal to the
    full-batch gradient for equal-sized microbatches; tested).
    Metrics: ``{"loss": mean loss over the batch}``.
    """
    if accum < 1:
        from .core.errors import raise_error

        raise_error("make_train_step: accum must be >= 1, got {}", accum)
    pred = _trainable_pred(trainable)

    def grads_of(params, batch):
        train, frozen = _split(params, pred)

        def loss_of_trainable(t, b):
            return loss_fn({**t, **frozen}, b)

        return jax.value_and_grad(loss_of_trainable)(train, batch)

    def step(state: TrainState, batch):
        if accum == 1:
            loss, grads = grads_of(state.params, batch)
        else:
            # leaf shapes are static at trace time: a mismatched microbatch
            # count would otherwise silently mis-scale the gradient by
            # leading/accum (the sums below divide by accum)
            for leaf in jax.tree_util.tree_leaves(batch):
                if jnp.shape(leaf)[0] != accum:
                    from .core.errors import raise_error

                    raise_error(
                        "make_train_step(accum={}): every batch leaf needs "
                        "leading axis {} (microbatch count), got shape {}",
                        accum, accum, jnp.shape(leaf),
                    )
            train0, _ = _split(state.params, pred)
            g0 = jax.tree_util.tree_map(
                lambda p: jnp.zeros(jnp.shape(p), jnp.float32), train0
            )

            def body(carry, micro):
                loss_sum, gsum = carry
                loss, g = grads_of(state.params, micro)
                gsum = jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(jnp.float32), gsum, g
                )
                return (loss_sum + loss, gsum), None

            (loss_sum, gsum), _ = jax.lax.scan(body, (jnp.zeros((), jnp.float32), g0), batch)
            loss = loss_sum / accum
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
        train, frozen = _split(state.params, pred)
        grads = jax.tree_util.tree_map(lambda g, p: g.astype(p.dtype), grads, train)
        updates, new_opt = optimizer.update(grads, state.opt_state, train)
        import optax

        new_train = optax.apply_updates(train, updates)
        new_params = {**frozen, **new_train}
        new_state = TrainState(step=state.step + 1, params=new_params, opt_state=new_opt)
        return new_state, {"loss": loss}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P

    # accum batches: (accum, micro, ...) — dp shards the SECOND axis
    bspec = P(None, "dp") if accum > 1 else P("dp")
    bs = NamedSharding(mesh, bspec)
    return jax.jit(step, in_shardings=(None, bs), donate_argnums=(0,))


def export_gguf(
    params: Mapping[str, Any],
    dst: str | os.PathLike,
    source=None,
    arch: str | None = None,
    float_type: str = "f32",
) -> str:
    """Write (fine-tuned) in-memory params back to a deployable GGUF file.

    Completes the load -> fine-tune -> serve loop: ``params`` is the flat
    dotted-name dict in the loader contract's torch-canonical layouts
    (exactly what ``load_weights`` returns and ``TrainState.params``
    holds), so the output file loads through every existing model path.

    ``source`` (a GGUFFile or path) copies the family/arch KVs the
    detection and builders need — EXCEPT the storage-layout ones
    (``{arch}.tensor_data_layout``, ``{arch}.conv2d_weights``,
    ``general.file_type``): tensors are written torch-canonical, never
    cwhn-permuted, so echoing a source cwhn marker would make the loader
    un-permute them a second time. The file instead carries
    ``tensor_data_layout = "torch"`` — EVERY tensor is torch-canonical —
    which the per-family ``fixup_weights`` passes honor by skipping their
    whcn-file special cases (the converter stores e.g. patch_embed
    weights cwhn even in whcn files; an exported file does not).

    ``float_type``: "f32" or "f16" storage (bf16 device arrays convert to
    f32 ON device first — NOTES.md: np.asarray on bf16 is pathological
    over the tunnel). For block-quantized deployment run the result
    through ``requantize_gguf`` / ``vision-cli quantize``.
    """
    from .core.gguf import GGUFFile, GGUFWriter, REQUANTIZE_TYPES

    if float_type not in ("f32", "f16"):
        from .core.errors import raise_error

        raise_error(
            "export_gguf: float_type must be 'f32' or 'f16' (quantize the "
            "result with requantize_gguf), got '{}'", float_type,
        )
    if source is not None and not isinstance(source, GGUFFile):
        source = GGUFFile(source)
    if arch is None:
        arch = source.arch if source is not None else None
    if not arch:
        from .core.errors import raise_error

        raise_error("export_gguf: pass arch= or a source file with an architecture")
    w = GGUFWriter(os.fspath(dst), arch)
    if source is not None:
        drop = {
            "general.file_type",
            "general.architecture",
            f"{arch}.tensor_data_layout",
            f"{arch}.conv2d_weights",
        }
        for k, v in source.metadata.items():
            if k not in drop:
                w.add(k, v, vtype=source.kv_types.get(k))
    w.add("general.file_type", REQUANTIZE_TYPES[float_type][0])
    w.add(f"{arch}.tensor_data_layout", "torch")
    target = np.float16 if float_type == "f16" else np.float32
    from .core.quant import QuantResident

    for name, v in params.items():
        if isinstance(v, QuantResident):
            # a quantized-resident leaf (QLoRA base / VISP_KEEP_QUANT load)
            # densifies for the f32/f16 file; requantize the output for
            # block-quantized deployment
            v = v.dequant()
        if isinstance(v, jax.Array):
            if v.dtype == jnp.bfloat16:
                v = v.astype(jnp.float32)
            v = np.asarray(jax.device_get(v))
        else:
            v = np.asarray(v)
        if v.dtype == jnp.bfloat16:
            # host-numpy bf16 (ml_dtypes): np.issubdtype says NOT floating,
            # which would skip the cast and store GGML BF16 under an f16/f32
            # file_type claim
            v = v.astype(np.float32)
        if np.issubdtype(v.dtype, np.floating):
            v = v.astype(target, copy=False)
        w.add_tensor(name, v)
    w.write()
    return os.fspath(dst)


def data_loader(
    items: Sequence,
    batch_size: int,
    load: Callable | None = None,
    workers: int = 4,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
):
    """Threaded host-side batch producer: maps ``load`` (decode +
    preprocess, e.g. ``image.image_load`` + resize) over ``items`` with a
    worker pool so host work overlaps device steps, then stacks each
    group of ``batch_size`` results into one batch pytree (leaves gain a
    leading batch axis). Chain into ``prefetch_to_device`` for the full
    input pipeline:

        for batch in prefetch_to_device(data_loader(paths, 32, load=prep), mesh=mesh):
            state, metrics = step(state, batch)

    ``load=None`` uses the items as-is. Results keep item order within
    each batch; ``shuffle`` reorders items per epoch-call with ``seed``.
    ``drop_last`` drops a trailing partial batch (static shapes — a
    ragged final batch would recompile the step).
    """
    from concurrent.futures import ThreadPoolExecutor

    if batch_size < 1:
        from .core.errors import raise_error

        raise_error("data_loader: batch_size must be >= 1, got {}", batch_size)
    order = list(range(len(items)))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    n = (len(order) // batch_size) * batch_size if drop_last else len(order)
    order = order[:n]
    if not order:
        return

    def stack(results):
        return jax.tree_util.tree_map(lambda *leaves: np.stack(leaves), *results)

    if load is None:
        load = lambda x: x
    import collections

    groups = [order[i : i + batch_size] for i in range(0, len(order), batch_size)]
    with ThreadPoolExecutor(max_workers=workers) as pool:
        # keep at most 2 batches of loads in flight: overlap without
        # pulling the whole dataset into host memory
        pending: collections.deque = collections.deque()
        gi = 0
        while gi < len(groups) or pending:
            while gi < len(groups) and len(pending) < 2:
                pending.append([pool.submit(load, items[j]) for j in groups[gi]])
                gi += 1
            yield stack([f.result() for f in pending.popleft()])


def prefetch_to_device(batches, size: int = 2, mesh=None, accum: int = 1):
    """Wrap a host batch iterator with device prefetch.

    Keeps ``size`` batches in flight: ``jax.device_put`` is async, so the
    H2D transfer of batch N+1 overlaps the device compute of batch N —
    the standard TPU input-pipeline shape (the training analog of the
    serving layer's prep-worker pool). With a mesh, every leaf lands
    dp-sharded on its leading axis (the layout ``make_train_step``
    expects). Pass the SAME ``accum`` you gave ``make_train_step`` when
    using gradient accumulation: batch leaves then carry a leading
    ``(accum, micro, ...)`` microbatch axis and dp must shard axis 1 —
    sharding the accum axis itself would hand each chip different
    microbatch steps instead of different samples (and fail outright when
    dp does not divide K).
    """
    import collections

    if size < 1 or accum < 1:
        from .core.errors import raise_error

        raise_error(
            "prefetch_to_device: size and accum must be >= 1, got {} / {}",
            size, accum,
        )
    if mesh is None:
        sharding = None
    elif accum > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec(None, "dp"))
    else:
        sharding = batch_sharding(mesh)

    def put(b):
        if sharding is None:
            return jax.tree_util.tree_map(jnp.asarray, b)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), b)

    it = iter(batches)
    queue = collections.deque()
    done = False
    while True:
        while not done and len(queue) < size:
            try:
                queue.append(put(next(it)))
            except StopIteration:
                done = True
        if not queue:
            return
        yield queue.popleft()


def ema_update(ema: Mapping[str, Any], params: Mapping[str, Any], decay: float = 0.999):
    """One exponential-moving-average step over a param dict:
    ``ema <- decay * ema + (1 - decay) * params`` for float leaves
    (non-float buffers track ``params`` verbatim).

    The standard eval/serving-weights trick for SR/GAN fine-tuning
    (Real-ESRGAN ships EMA weights). Pure and jittable — fold it into the
    train loop (or jit it once) and evaluate/export the EMA dict:

        ema = dict(state.params)                     # init = params
        for batch in loader:
            state, metrics = step(state, batch)
            ema = ema_step(ema, state.params)        # ema_step = jax.jit(ema_update)
        export_gguf(ema, "finetuned-ema.gguf", source=...)
    """
    def one(e, p):
        if not _is_float(p):
            return p
        d = jnp.asarray(decay, jnp.asarray(e).dtype)
        return e * d + p * (1 - d)

    return jax.tree_util.tree_map(one, dict(ema), dict(params))


# ---------------------------------------------------------------------------
# Checkpoint / resume (orbax)


_CKPTR = None


def _ckptr():
    # one process-wide checkpointer: each StandardCheckpointer owns an
    # async executor, so per-call construction would leak threads across
    # a long run's periodic saves
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint(directory: str | os.PathLike, state: TrainState, *, force: bool = True) -> str:
    """Write ``state`` to ``directory`` (one orbax checkpoint per dir).

    Blocks until the write is durable (orbax saves are async by default —
    a preempted process must not lose its last save). ``force`` replaces
    an existing checkpoint at the same path.
    """
    path = os.path.abspath(os.fspath(directory))
    ckptr = _ckptr()
    ckptr.save(path, state, force=force)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(directory: str | os.PathLike, like):
    """Restore a checkpoint from ``directory``.

    ``like`` supplies the tree structure, dtypes, AND shardings — pass the
    freshly-built state (create_train_state on the same mesh) and the
    restored arrays land directly on the same placement, bit-exact.
    ``like`` is usually a TrainState; any pytree of the same structure as
    the saved one works (e.g. the ``(state, ema)`` pair the finetune
    recipes checkpoint), reconstructed leaf-by-leaf into ``like``'s
    structure.
    """
    path = os.path.abspath(os.fspath(directory))

    def abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        a = np.asarray(x)
        return jax.ShapeDtypeStruct(a.shape, a.dtype)

    template = jax.tree_util.tree_map(abstract, like)
    restored = _ckptr().restore(path, template)
    if isinstance(like, TrainState):
        return TrainState(*restored)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), jax.tree_util.tree_leaves(restored)
    )


def latest_checkpoint(root: str | os.PathLike) -> str | None:
    """Scan ``root`` for ``step_*`` subdirectories (the conventional layout
    ``save_checkpoint(root/f"step_{n}")``) and return the newest, or None."""
    root = os.path.abspath(os.fspath(root))
    if not os.path.isdir(root):
        return None
    best, best_n = None, -1
    for name in os.listdir(root):
        m = re.fullmatch(r"step_(\d+)", name)
        if m and int(m.group(1)) > best_n:
            best, best_n = os.path.join(root, name), int(m.group(1))
    return best

"""Batched request serving over one chip or a dp mesh.

The reference engine is strictly single-request: one image in, one result
out per call (``src/visp/vision.cpp:36-95``). On TPU the per-dispatch cost
(RPC + program launch) and the MXU's preference for large batches make
request batching the scaling axis (SURVEY.md §5 last row): many concurrent
client requests are grouped into ONE fixed-shape jitted program, and with a
``jax.sharding.Mesh`` the grouped batch additionally shards over chips via
the dp axis (``parallel/sharding.py``), so N chips serve N requests per
step over ICI.

Two layers:

* :class:`BatchServer` — model-agnostic batching queue. Clients ``submit()``
  items and get ``concurrent.futures.Future`` results; host-side request
  preparation (resize/normalize/coord transforms) runs on a dedicated prep
  worker pool so ``submit()`` returns immediately; a batch worker thread
  drains the queue, groups items that share a shape bucket (different
  extents must not share a compiled program), pads each group to the fixed
  batch size (static shapes => one compiled program per bucket), and runs
  the supplied batch function.
* :class:`SamServer` — end-to-end promptable-segmentation service on a
  :class:`~vision_tpu.models.mobile_sam.SamModel`: each request is an
  (image, point-or-box prompt) pair; encode + prompt-encode + mask decode
  for the whole group run as one device program. :class:`EsrganServer`
  and the generic :class:`ImageServer` (birefnet / depth-anything /
  MI-GAN) do the same for the image->image families.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Any, Callable, Sequence

import numpy as np

__all__ = ["BatchServer", "ServerStats", "SamServer", "EsrganServer", "ImageServer", "YoloServer"]

_LATENCY_WINDOW = 4096  # most recent request latencies kept for percentiles


def _warmup_wait(futures: Sequence[Future], what: str) -> None:
    """Bounded wait on warmup futures, with stderr narration.

    A warmup compile riding a degraded tunnel once took ~25 min with zero
    output (NOTES round-4f); the same discipline as the bench probe applies:
    narrate progress every minute and fail CLEANLY after
    ``VISP_WARMUP_TIMEOUT`` seconds (default 900 — generous enough for a
    healthy cold remote compile) instead of stalling the caller forever.
    On timeout the server itself stays up — the caller can retry warmup,
    or serve cold and let the first real request absorb the compile.
    """
    import os
    import sys

    timeout = float(os.environ.get("VISP_WARMUP_TIMEOUT", "900"))
    t0 = time.monotonic()
    for fut in futures:
        while True:
            remaining = timeout - (time.monotonic() - t0)
            if remaining <= 0:
                raise TimeoutError(
                    f"serve: warmup({what}) did not complete within "
                    f"{timeout:.0f}s (degraded-tunnel compile hang? see "
                    "NOTES.md); the server is still running — retry "
                    "warmup(), raise VISP_WARMUP_TIMEOUT, or serve cold"
                )
            try:
                fut.result(timeout=min(60.0, remaining))
                break
            except TimeoutError:
                print(
                    f"serve: warmup({what}) still compiling after "
                    f"{time.monotonic() - t0:.0f}s",
                    file=sys.stderr, flush=True,
                )


def _deliver_exception(fut: Future, exc: BaseException) -> None:
    """set_exception tolerant of a client having cancelled the Future
    (InvalidStateError from a worker thread would kill the worker)."""
    try:
        fut.set_exception(exc)
    except Exception:
        pass


def _resolve_batch(batch_size: int | None, per_chip_default: int, mesh) -> int:
    """Resolve a server's batch size: ``None`` means the family's measured
    per-chip default, scaled by the mesh's dp extent so every chip keeps its
    optimal shard; an explicit value must divide evenly over the dp axis."""
    dp = mesh.shape["dp"] if mesh is not None else 1
    if batch_size is None:
        return per_chip_default * dp
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if batch_size % dp:
        raise ValueError(f"batch_size {batch_size} not divisible by mesh dp={dp}")
    return batch_size


@dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    batched_items: int = 0
    _latencies_ms: list = field(default_factory=list, repr=False)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    @property
    def occupancy(self) -> float:
        """Mean items per executed batch (NOT a fraction of batch_size)."""
        return self.batched_items / self.batches if self.batches else 0.0

    def _record_latencies(self, lat_ms: Sequence[float]) -> None:
        with self._lock:
            self._latencies_ms.extend(lat_ms)
            if len(self._latencies_ms) > _LATENCY_WINDOW:
                del self._latencies_ms[: -_LATENCY_WINDOW]

    def latency_ms(self, pct: float) -> float:
        """Request latency percentile (submit -> result), in milliseconds."""
        with self._lock:
            if not self._latencies_ms:
                return 0.0
            return float(np.percentile(self._latencies_ms, pct))

    @property
    def p50_latency_ms(self) -> float:
        return self.latency_ms(50.0)

    @property
    def p99_latency_ms(self) -> float:
        return self.latency_ms(99.0)

    def reset(self) -> None:
        """Zero all counters and the latency window — called after warmup so
        multi-minute first-compile latencies and padding-only warmup batches
        don't poison the percentiles a dashboard reads."""
        with self._lock:
            self.requests = 0
            self.batches = 0
            self.batched_items = 0
            self._latencies_ms.clear()


class BatchServer:
    """Group concurrent requests into fixed-size batches for one device program.

    Parameters
    ----------
    fn: called with a list of 1..batch_size items (one shape bucket), must
        return a sequence of per-item results in order. It sees only real
        items — padding to the program's static batch is the adapter's job.
    batch_size: maximum items per call (with a dp mesh, use a multiple of
        the mesh's dp extent so the shard is even).
    max_delay_ms: how long the worker waits for more same-bucket items
        before dispatching a partial batch. Latency/throughput knob.
    bucket_key: items whose key differs are never batched together (use the
        processed input shape — mixed shapes would retrace the program).
    prepare: optional host-side request preparation, run on a worker pool
        of ``prep_workers`` threads so ``submit()`` never blocks on pixel
        math (a client thread doing its own prep would serialize the queue
        and starve the batch window). ``bucket_key`` sees prepared items.
    """

    def __init__(
        self,
        fn: Callable[[list], Sequence],
        batch_size: int = 8,
        max_delay_ms: float = 2.0,
        bucket_key: Callable[[Any], Any] = lambda item: None,
        prepare: Callable[[Any], Any] | None = None,
        prep_workers: int = 4,
    ):
        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        self._fn = fn
        self.batch_size = batch_size
        self.max_delay = max_delay_ms / 1e3
        self._bucket_key = bucket_key
        self._prepare = prepare
        self._queue: queue.Queue = queue.Queue()
        self._pending: dict[Any, list] = {}
        self._deadlines: dict[Any, float] = {}  # per-bucket batch-window end
        self.stats = ServerStats()
        self._closed = False
        # guards the _closed flag vs. queue writes: nothing may enqueue
        # after the shutdown sentinel or its Future would never resolve
        self._close_lock = threading.Lock()
        self._prep_pool = (
            ThreadPoolExecutor(max_workers=prep_workers, thread_name_prefix="visp-prep")
            if prepare is not None
            else None
        )
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client side --------------------------------------------------------

    def submit(self, item) -> Future:
        fut: Future = Future()
        t0 = time.perf_counter()
        with self._close_lock:
            if self._closed:
                raise RuntimeError("server is closed")
            if self._prep_pool is not None:
                self._prep_pool.submit(self._prep_task, item, fut, t0)
            else:
                self._queue.put((item, fut, t0))
        with self.stats._lock:
            self.stats.requests += 1
        return fut

    def _prep_task(self, item, fut: Future, t0: float) -> None:
        try:
            prepared = self._prepare(item)
        except BaseException as e:  # noqa: BLE001 — prep failures travel to the caller
            _deliver_exception(fut, e)
            return
        # no lock needed: close() drains this pool BEFORE the sentinel
        self._queue.put((prepared, fut, t0))

    def compute(self, item):
        """Synchronous convenience: submit and wait."""
        return self.submit(item).result()

    def close(self):
        """Drain outstanding requests, then stop the worker."""
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
        # in-flight prep tasks still enqueue; wait for them, THEN send the
        # sentinel so no entry can land behind it (its Future would hang)
        if self._prep_pool is not None:
            self._prep_pool.shutdown(wait=True)
        self._queue.put(None)
        self._worker.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker side --------------------------------------------------------

    def _take(self, timeout) -> bool:
        """Move one queue entry into the pending buckets. False = shutdown."""
        try:
            entry = self._queue.get(timeout=timeout)
        except queue.Empty:
            return True
        if entry is None:
            return False
        self._bucket(entry)
        return True

    def _bucket(self, entry) -> None:
        item, fut, _ = entry
        try:
            key = self._bucket_key(item)
        except BaseException as e:  # noqa: BLE001 — a bad key must not kill the worker
            _deliver_exception(fut, e)
            return
        if key not in self._pending:
            self._deadlines[key] = time.monotonic() + self.max_delay
        self._pending.setdefault(key, []).append(entry)

    def _dispatch(self, group: list) -> None:
        # claim each Future (-> RUNNING, after which client cancel() fails);
        # entries whose client already cancelled are dropped — calling
        # set_result on a cancelled Future raises InvalidStateError, which
        # would kill this worker thread and hang every later request
        live = [e for e in group if e[1].set_running_or_notify_cancel()]
        if not live:
            return
        items = [it for it, _, _ in live]
        try:
            results = self._fn(items)
            if len(results) != len(items):
                raise RuntimeError(
                    f"batch fn returned {len(results)} results for {len(items)} items"
                )
        except BaseException as e:  # noqa: BLE001 — failures travel to callers
            for _, fut, _ in live:
                fut.set_exception(e)
            return
        with self.stats._lock:
            self.stats.batches += 1
            self.stats.batched_items += len(items)
        done = time.perf_counter()
        for (_, fut, _), res in zip(live, results):
            fut.set_result(res)
        self.stats._record_latencies([(done - t0) * 1e3 for _, _, t0 in live])

    def _drain_queue(self) -> None:
        while True:
            try:
                entry = self._queue.get_nowait()
            except queue.Empty:
                return
            if entry is not None:
                self._bucket(entry)

    def _run(self) -> None:
        alive = True
        while alive or self._pending:
            if alive:
                # wake by the soonest bucket deadline (each bucket keeps its
                # OWN max_delay window: one bucket filling must not flush a
                # partial sibling that is still collecting requests)
                timeout = 0.05
                if self._pending:
                    soonest = min(self._deadlines[k] for k in self._pending)
                    timeout = min(max(soonest - time.monotonic(), 0.0), 0.05)
                alive = self._take(timeout=timeout)
                if not alive:
                    self._drain_queue()
            now = time.monotonic()
            for key in list(self._pending):
                bucket = self._pending[key]
                if alive and len(bucket) < self.batch_size and now < self._deadlines[key]:
                    continue  # inside its batch window and not full
                del self._pending[key]
                self._deadlines.pop(key, None)
                for i in range(0, len(bucket), self.batch_size):
                    self._dispatch(bucket[i : i + self.batch_size])



def _dummy_image(extent=(64, 64), fmt=None):
    """Zero image for server warmup requests (extent = (width, height))."""
    from .image import Image, ImageFormat

    w, h = extent
    return Image(np.zeros((h, w, 4), np.uint8), fmt or ImageFormat.rgba_u8)


@lru_cache(maxsize=None)
def _sam_serve_pipelines(dtype_str: str, flash: bool, mesh):
    """Jitted fused encode+decode group pipelines, shared across SamServer
    instances of one (dtype, flash, mesh) config — weights are arguments,
    so a second server reuses the first's executables instead of paying
    the multi-minute TPU trace+compile again."""
    import jax
    import jax.numpy as jnp

    from .core.params import Params
    from .models.mobile_sam import (
        sam_encode_box,
        sam_encode_image,
        sam_encode_points,
        sam_predict_mask,
    )
    from .ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_u8

    dtype = jnp.dtype(dtype_str)

    def pipeline(encode_prompt):
        def run(weights, x_u8, coords):
            pp = Params(weights)
            x = normalize_u8(x_u8, IMAGENET_MEAN, IMAGENET_STD, dtype)
            embeds = sam_encode_image(pp, x, flash=flash)

            def one(embed, c):
                pred = sam_predict_mask(pp, embed[None], encode_prompt(pp, c))
                # best-mask selection on device (reference argmax-IoU,
                # vision.cpp:80-84): ships ONE mask per request across
                # the D2H boundary instead of all four candidates
                idx = jnp.argmax(pred.iou[0, :3])
                return pred.masks[0, idx], pred.iou[0]

            masks, ious = jax.vmap(one)(embeds, coords)
            return masks.astype(jnp.float32), ious.astype(jnp.float32)

        if mesh is not None:
            from .parallel import batch_sharding

            bs = batch_sharding(mesh)
            return jax.jit(run, in_shardings=(None, bs, bs), out_shardings=(bs, bs))
        return jax.jit(run)

    return {"point": pipeline(sam_encode_points), "box": pipeline(sam_encode_box)}


class SamServer:
    """Concurrent promptable segmentation on a SamModel.

    Each request is ``(image, prompt)`` where prompt is a 2-tuple point or a
    ``((x0, y0), (x1, y1))`` box (the reference prompt forms,
    ``vision.cpp:54-95``). Requests are grouped (points and boxes bucket
    separately — they run different prompt encoders) and the whole group is
    encoded AND decoded in one jitted program; with a mesh the group batch
    is dp-sharded. Host-side preparation (the 1024² resize + coordinate
    transform) runs on the BatchServer's prep pool, off the caller thread.
    """

    def __init__(
        self,
        model,
        # None -> 6 per chip: the measured space-to-batch optimum for the
        # TinyViT encoder (289.8 img/s vs 273.1 at b4; batch >= 8 leaves
        # XLA's deep-batch conv regime and drops to 255 — NOTES.md round-4d
        # knee analysis). On a dp mesh the default scales to dp*6 so every
        # chip still runs its optimal shard.
        batch_size: int | None = None,
        max_delay_ms: float = 2.0,
        prep_workers: int = 4,
    ):
        from .core.device import BuildFlag

        self.model = model
        batch_size = _resolve_batch(batch_size, 6, model.mesh)
        self.batch_size = batch_size
        dtype = model.device.preferred_float_type
        flash = bool(model.device.flags & BuildFlag.flash_attention)
        # shared across instances (same convention as _sam_programs): two
        # SamServers of one config reuse the same traced/compiled pipelines
        self._pipelines = _sam_serve_pipelines(str(np.dtype(dtype)), flash, model.mesh)
        self._server = BatchServer(
            self._run_group,
            batch_size=batch_size,
            max_delay_ms=max_delay_ms,
            bucket_key=lambda item: item[1],  # prompt kind
            prepare=self._prepare,
            prep_workers=prep_workers,
        )

    # raw request = (image, point, box); prepared = (x, kind, coords, extent)
    def _prepare(self, request):
        from .models.mobile_sam import (
            sam_process_box,
            sam_process_input_u8,
            sam_process_point,
        )

        image, point, box = request
        x = sam_process_input_u8(image, self.model.p)
        if point is not None:
            kind, coords = "point", sam_process_point(point, image.extent, self.model.p)
        else:
            kind, coords = "box", sam_process_box(box[0], box[1], image.extent, self.model.p)
        return (x, kind, coords, image.extent)

    def _run_group(self, items: list):
        import jax.numpy as jnp

        from .models.mobile_sam import sam_process_mask

        kind = items[0][1]
        n = len(items)
        # pad to the static batch with the first item (one compiled program)
        padded = items + [items[0]] * (self.batch_size - n)
        x = np.stack([it[0] for it in padded])
        coords = np.stack([it[2] for it in padded])
        masks, ious = self._pipelines[kind](self.model.params, jnp.asarray(x), jnp.asarray(coords))
        masks = np.asarray(masks[:n])  # (n, 256, 256): pad sliced off on device
        out = []
        for i, (_, _, _, extent) in enumerate(items):
            out.append(sam_process_mask(masks[i][None], 0, extent, self.model.p))
        return out

    def warmup(self, kinds=("point", "box")) -> None:
        """Compile the batched encode+decode pipeline(s) before taking
        traffic (cold-start control; with a persistent XLA cache —
        VISP_COMPILE_CACHE — repeat warmups are fast)."""
        img = _dummy_image()
        futs = []
        for kind in kinds:
            if kind == "point":
                futs.append(self.submit(img, point=(32, 32)))
            else:
                futs.append(self.submit(img, box=((8, 8), (56, 56))))
        _warmup_wait(futs, f"sam {'+'.join(kinds)}")
        # first-compile latencies (minutes on a cold TPU) and padding-only
        # warmup batches must not poison the percentiles/occupancy
        self.stats.reset()

    def submit(self, image, point=None, box=None) -> Future:
        if (point is None) == (box is None):
            raise ValueError("exactly one of point/box must be given")
        return self._server.submit((image, point, box))

    def compute(self, image, point=None, box=None):
        return self.submit(image, point=point, box=box).result()

    @property
    def stats(self) -> ServerStats:
        return self._server.stats

    def close(self):
        self._server.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class EsrganServer:
    """Concurrent whole-image super-resolution on an EsrganModel.

    Requests are :class:`~vision_tpu.image.Image` instances; same-extent
    images batch into ONE device program (the reference runs a sequential
    per-tile loop, ``vision.cpp:240-251`` — here N requests of one extent
    are a single batched RRDBNet call; mixed extents bucket separately).
    Intended for serving-size inputs that fit whole-image execution; large
    inputs should go through ``EsrganModel.compute``'s tiled path instead.
    """

    def __init__(
        self,
        model,
        # None -> 4 per chip (4*dp on a mesh): whole-image RRDBNet batches
        # scale memory linearly, and 4 keeps the 1024^2 bucket inside HBM
        batch_size: int | None = None,
        max_delay_ms: float = 2.0,
        prep_workers: int = 2,
        max_pixels: int = 1024 * 1024,
    ):
        self.model = model
        batch_size = _resolve_batch(batch_size, 4, model.mesh)
        self.batch_size = batch_size
        # whole-image serving limit: an oversized request would trigger a
        # one-off multi-minute compile + huge activations; the tiled
        # EsrganModel.compute path exists for those
        self.max_pixels = max_pixels
        self._server = BatchServer(
            self._run_group,
            batch_size=batch_size,
            max_delay_ms=max_delay_ms,
            bucket_key=lambda item: item[1],  # image extent
            prepare=self._prepare,
            prep_workers=prep_workers,
        )

    # raw request = Image; prepared = (rgb_u8 array, extent)
    def _prepare(self, image):
        w, h = image.extent
        if w * h > self.max_pixels:
            raise ValueError(
                f"image {image.extent} exceeds the whole-image serving limit "
                f"({self.max_pixels} px); use EsrganModel.compute's tiled path"
            )
        return (image.to_rgb_u8(), image.extent)

    def _run_group(self, items: list):
        import jax.numpy as jnp

        from .image import Image, ImageFormat

        n = len(items)
        extent = items[0][1]
        padded = items + [items[0]] * (self.batch_size - n)
        x = np.stack([it[0] for it in padded])
        fn = self.model._fn(("serve", self.batch_size, extent), True, extent)
        # slice the pad off ON DEVICE: D2H of the full padded batch costs
        # seconds at tunnel bandwidth for partial groups (NOTES.md)
        y = np.asarray(fn(jnp.asarray(x))[:n])
        alpha = np.full((*y.shape[1:3], 1), 255, np.uint8)
        return [
            Image(np.ascontiguousarray(np.concatenate([yi, alpha], axis=2)), ImageFormat.rgba_u8)
            for yi in y
        ]

    def warmup(self, extent=(256, 256)) -> None:
        """Compile the batched program for ``extent`` before taking traffic
        (extent buckets compile separately — warm the sizes you serve)."""
        _warmup_wait([self.submit(_dummy_image(extent))], f"esrgan {extent}")
        self.stats.reset()  # compile latency must not poison the percentiles

    def submit(self, image) -> Future:
        return self._server.submit(image)

    def compute(self, image):
        return self.submit(image).result()

    @property
    def stats(self) -> ServerStats:
        return self._server.stats

    def close(self):
        self._server.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ImageServer:
    """Batched serving for the whole-image model families.

    One class covers :class:`~vision_tpu.models.birefnet.BirefnetModel`,
    :class:`~vision_tpu.models.depth_anything.DepthAnythingModel`, and
    :class:`~vision_tpu.models.migan.MiganModel` — their device programs
    are batch-general NHWC, so N concurrent requests at one processed
    extent run as ONE jitted call (the reference handles these families
    strictly one request at a time, ``vision.cpp:97-205``). A request is
    an :class:`~vision_tpu.image.Image`; MI-GAN takes ``(image, mask)``.
    Outputs are post-processed back to each request's own extent with the
    family's ``*_process_output`` semantics. A model constructed with a
    ``mesh`` serves multi-chip: the grouped batch dp-shards over the mesh,
    so N chips serve N requests per step (``batch_size`` must be a multiple
    of the mesh's dp extent — groups always pad to the full batch).
    """

    def __init__(
        self,
        model,
        # None -> 4 per chip (4*dp on a mesh)
        batch_size: int | None = None,
        max_delay_ms: float = 2.0,
        prep_workers: int = 2,
        max_pixels: int = 4 * 1024 * 1024,
    ):
        kind = type(model).__name__
        if kind not in ("BirefnetModel", "DepthAnythingModel", "MiganModel"):
            raise TypeError(f"ImageServer does not support {kind}")
        self.model = model
        self.kind = kind
        batch_size = _resolve_batch(batch_size, 4, model.mesh)
        self.batch_size = batch_size
        # depth-anything snaps its processed extent UP from the input, so
        # an unguarded huge upload would jit a one-off giant program (the
        # same remote resource-exhaustion hole EsrganServer.max_pixels
        # closes); birefnet/migan resize to fixed extents but still pay
        # host-side prep proportional to the upload
        self.max_pixels = max_pixels
        self._server = BatchServer(
            self._run_group,
            batch_size=batch_size,
            max_delay_ms=max_delay_ms,
            bucket_key=lambda it: it[0].shape,
            prepare=self._prepare,
            prep_workers=prep_workers,
        )

    # prepared item = (u8 input array [, u8 mask array], processed extent, original request)
    def _prepare(self, request):
        from .image import image_scale, preprocess_scale_method

        req_img = request[0] if isinstance(request, tuple) else request
        if req_img.width * req_img.height > self.max_pixels:
            raise ValueError(
                f"input {req_img.width}x{req_img.height} exceeds the server's "
                f"max_pixels ({self.max_pixels}); resize client-side or raise the cap"
            )
        if self.kind == "MiganModel":
            image, mask = request
            res = (self.model.p.resolution, self.model.p.resolution)
            # condition on RGB only BEFORE any resize: stb resize alpha-
            # premultiplies, and for migan the request alpha channel is the
            # inpaint MASK — premultiplying would black out the keep region
            if image.data.ndim == 3 and image.data.shape[2] == 4:
                from .image import Image as _Image
                from .image import ImageFormat as _Fmt

                image = _Image(np.ascontiguousarray(image.to_rgb_u8()), _Fmt.rgb_u8)
            img_r = image if image.extent == res else image_scale(image, res, preprocess_scale_method())
            mask_r = mask if mask.extent == res else image_scale(mask, res, preprocess_scale_method())
            m = mask_r.data[:, :, :1]
            if np.issubdtype(m.dtype, np.floating):
                m = (np.clip(m, 0.0, 1.0) * 255.0).astype(np.uint8)
            return (img_r.to_rgb_u8(), m, res, request)
        image = request
        if self.kind == "BirefnetModel":
            from .models.birefnet import birefnet_image_extent

            extent = birefnet_image_extent(image.extent, self.model.p, self.model.device.max_alloc)
        else:
            from .models.depth_anything import depthany_image_extent

            extent = depthany_image_extent(image.extent, self.model.p)
        img = image if image.extent == extent else image_scale(image, extent, preprocess_scale_method())
        return (img.to_rgb_u8(), extent, image)

    def _run_group(self, items: list):
        import jax.numpy as jnp

        n = len(items)
        padded = items + [items[0]] * (self.batch_size - n)
        x = jnp.asarray(np.stack([it[0] for it in padded]))
        sharded = self.model.mesh is not None
        if self.kind == "MiganModel":
            from .models.migan import migan_process_output

            run = self.model._run_sharded if sharded else self.model._run
            m = jnp.asarray(np.stack([it[1] for it in padded]))
            y = np.asarray(run(self.model.params, x, m)[:n].astype(jnp.float32))
            return [migan_process_output(yi, img, mask) for yi, (_, _, _, (img, mask)) in zip(y, items)]
        extent = items[0][1]
        fn = self.model._fn(extent, sharded=sharded)
        y = np.asarray(fn(self.model.params, x)[:n].astype(jnp.float32))
        if self.kind == "BirefnetModel":
            from .models.birefnet import birefnet_process_output as post
        else:
            from .models.depth_anything import depthany_process_output as post
        return [post(yi, it[2].extent) for yi, it in zip(y, items)]

    def warmup(self, extent=None) -> None:
        """Compile the batched program before taking traffic. Default
        extent: the model's canonical inference size (birefnet/migan are
        fixed; depthany snaps the given or default 518x518 input)."""
        if self.kind == "MiganModel":
            res = (self.model.p.resolution, self.model.p.resolution)
            from .image import Image, ImageFormat

            mask = Image(np.zeros((res[1], res[0], 1), np.uint8), ImageFormat.alpha_u8)
            _warmup_wait([self.submit((_dummy_image(res), mask))], "migan")
            self.stats.reset()
            return
        if extent is None:
            if self.kind == "BirefnetModel":
                extent = self.model.p.image_extent
            else:
                # the model's own snap target, not a hard-coded 518: a
                # variant with a different detected image_size would
                # otherwise warm the wrong shape bucket
                size = self.model.p.image_size
                extent = (size, size)
        _warmup_wait([self.submit(_dummy_image(extent))], f"{self.kind} {extent}")
        self.stats.reset()

    def submit(self, request) -> Future:
        return self._server.submit(request)

    def compute(self, request):
        return self.submit(request).result()

    @property
    def stats(self) -> ServerStats:
        return self._server.stats

    def close(self):
        self._server.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _yolo_topk_program(model, k: int):
    """Batched detection forward + top-k candidate extraction on device.
    With a mesh-constructed model the image batch dp-shards over the mesh
    (each chip detects batch/dp images; the per-image top-k needs no
    cross-chip collective)."""
    import jax
    import jax.numpy as jnp

    run = model._run

    def fn(weights, x):
        out = run(weights, x)
        smax = jnp.max(out.scores, axis=-1)  # (B, A) best class per anchor
        _, idx = jax.lax.top_k(smax, k)  # (B, K)
        # restore anchor order: NMS breaks score ties by candidate order,
        # which must match the unbatched predict path
        idx = jnp.sort(idx, axis=-1)
        b = jnp.take_along_axis(out.boxes, idx[..., None], axis=1)
        sc = jnp.take_along_axis(out.scores, idx[..., None], axis=1)
        return b.astype(jnp.float32), sc.astype(jnp.float32)

    if model.mesh is not None:
        from .parallel import batch_sharding

        bs = batch_sharding(model.mesh)
        return jax.jit(fn, in_shardings=(None, bs), out_shardings=(bs, bs))
    return jax.jit(fn)


class YoloServer:
    """Concurrent object detection on a Yolov9tModel.

    Every request letterboxes to the model's square input size, so ALL
    requests share one shape bucket and one compiled program; NMS and the
    box un-letterbox run host-side per item (the device program is the
    whole detection DAG + candidate extraction, reference
    ``yolov9t.cpp`` / ``vision.cpp`` single-image semantics batched).
    Results are lists of :class:`~vision_tpu.models.yolov9t.Detection`.
    """

    def __init__(self, model, batch_size: int | None = None, max_delay_ms: float = 2.0,
                 prep_workers: int = 2, conf_thres: float = 0.25, iou_thres: float = 0.45,
                 max_candidates: int = 1024):
        self.model = model
        # None -> 8 per chip (8*dp on a mesh): YOLOv9t-640 is small enough
        # that deeper batches amortize dispatch without memory pressure
        batch_size = _resolve_batch(batch_size, 8, model.mesh)
        self.batch_size = batch_size
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        # device-side candidate extraction: only the top-K anchors by max
        # class score cross D2H (K * 84 floats vs all 8400 * 84 — ~8x less
        # transfer; SamServer does the analogous on-device reduction). K
        # bounds the candidates NMS sees: with pathologically low conf
        # thresholds (< ~0.05) raise max_candidates to match.
        n_anchors = sum((model.p.input_size // st) ** 2 for st in (8, 16, 32))
        self._topk = _yolo_topk_program(model, min(max_candidates, n_anchors))
        self._server = BatchServer(
            self._run_group,
            batch_size=batch_size,
            max_delay_ms=max_delay_ms,
            bucket_key=lambda it: it[0].shape,
            prepare=self._prepare,
            prep_workers=prep_workers,
        )

    # request = image | (image, conf, iou); prepared item =
    # (letterboxed u8 array, (original extent, gain, dw, dh), conf, iou)
    def _prepare(self, request):
        from .models.yolov9t import letterbox

        conf, iou = self.conf_thres, self.iou_thres
        if isinstance(request, tuple):
            request, conf, iou = request
        arr, gain, dw, dh = letterbox(request, self.model.p.input_size)
        return (arr, (request.extent, gain, dw, dh), conf, iou)

    def _run_group(self, items: list):
        import jax.numpy as jnp

        from .models.yolov9t import non_max_suppression, scale_boxes

        n = len(items)
        padded = items + [items[0]] * (self.batch_size - n)
        x = jnp.asarray(np.stack([it[0] for it in padded]))
        b_dev, s_dev = self._topk(self.model.params, x)
        boxes = np.asarray(b_dev[:n])
        scores = np.asarray(s_dev[:n])
        results = []
        for b, s, (_, (extent, gain, dw, dh), conf, iou) in zip(boxes, scores, items):
            dets = non_max_suppression(b, s, conf, iou)
            results.append(scale_boxes(dets, extent, gain, dw, dh))
        return results

    def warmup(self) -> None:
        """Compile the batched detection program (letterbox gives every
        request the same bucket, so one dummy request warms everything)."""
        _warmup_wait([self.submit(_dummy_image())], "yolov9t")
        self.stats.reset()

    def submit(self, image, conf_thres=None, iou_thres=None) -> Future:
        """Per-request thresholds override the server defaults (NMS is
        host-side per item, so mixed thresholds batch fine)."""
        if conf_thres is None and iou_thres is None:
            return self._server.submit(image)
        return self._server.submit((
            image,
            self.conf_thres if conf_thres is None else conf_thres,
            self.iou_thres if iou_thres is None else iou_thres,
        ))

    def compute(self, image, conf_thres=None, iou_thres=None):
        return self.submit(image, conf_thres, iou_thres).result()

    @property
    def stats(self) -> ServerStats:
        return self._server.stats

    def close(self):
        self._server.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

"""AOT model export — portable StableHLO deployment bundles.

The reference's deployment artifact is the GGUF weight file; every
consumer still needs the full C++ graph-builder at run time to turn it
into a program. On TPU the natural deployment artifact is the PROGRAM:
``jax.export`` serializes a jitted function (with or without its weights
baked in) as versioned StableHLO with JAX's cross-release compatibility
guarantees, and the loader side needs jax + this file format — none of
the model-building code, no GGUF parsing, no Python model classes.

A bundle is a zip with ``meta.json`` (format tag, family, per-entry
input specs) plus one ``<entry>.stablehlo`` blob per exported program:

  * ``export_model(model, dst)`` — family-aware: exports each of the
    model's jitted executables at a fixed geometry (SAM: ``encode`` +
    ``decode_point`` + ``decode_box``; everything else: ``forward`` /
    ``upscale``). With ``embed_params=True`` (default) the weights ride
    along as StableHLO constants — ONE self-contained file to ship; with
    ``embed_params=False`` the artifact is program-only (a few MB) and
    ``call`` takes the param dict as its first argument, exactly as
    ``load_weights`` returns it.
  * ``load_bundle(src).call(entry, *args)`` — deserialize + run. The
    first call per entry compiles for the local backend (the persistent
    compile cache applies); subsequent calls reuse the executable.

Geometry is static by design (XLA programs are shape-specialized): pick
``extent``/``batch`` at export time, export several bundles for several
shape buckets if needed — same discipline the serving layer's bucketing
uses. Topology is static the same way: ``jax.export`` records each input
and output sharding against a fixed device count, so a meshed export runs
only on a mesh of the SAME shape. That fits exactly one deployment case —
the dp-sharded serving batch — and ``SamModel`` (the flagship server)
exports it: a mesh-constructed SamModel with ``embed_params=False``
exports its dp-sharded ``encode`` (params replicated/tp-placed exactly as
the model placed them, image batch split over ``dp``) plus the per-prompt
decode entries; ``meta["mesh"]`` records the axis shape and
``ExportedBundle.call_sharded`` rebuilds the mesh from local devices,
places the arguments, and calls. The other families refuse a meshed
export — their sharded programs close over derived weight forms (packed /
stacked) whose placement is not reproducible from the GGUF param dict
alone; export unmeshed and shard at the call site instead.
By default programs lower for the platform jax is running on;
pass ``platforms=("cpu", "tpu")`` for a multi-platform artifact (costs
one lowering per platform; pallas-flash routes refuse a cpu lowering —
export those models with flags cleared or platforms=None).

Reference anchor: this subsystem has no reference counterpart (its
deploy story ends at the GGUF file, scripts/convert.py); it completes
SURVEY §5's checkpoint/resume row on the inference side — a compiled
program that survives the process.
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import Any, Callable, Mapping, Sequence

import jax
import numpy as np

from .core.errors import raise_error

__all__ = ["ExportedBundle", "export_bundle", "export_model", "load_bundle"]

FORMAT = "vision_tpu-export-v1"


def _leaf_specs(tree) -> list:
    return [
        [list(map(int, np.shape(l))), str(getattr(l, "dtype", type(l).__name__))]
        for l in jax.tree_util.tree_leaves(tree)
    ]


def _ensure_jit(fn):
    # jax.export wants a jit-wrapped callable; jit-of-jit is free
    return fn if hasattr(fn, "lower") else jax.jit(fn)


def _as_plain(x):
    """NamedTuples -> plain dicts, recursively. The model programs return
    NamedTuple pytrees (SamPrediction, DetectOutput, VisionOutput...)
    which jax.export refuses to serialize unless the loader registers the
    same types — a bundle must load with jax alone, so exported programs
    return {field: array} dicts instead."""
    if hasattr(x, "_fields"):
        return {k: _as_plain(v) for k, v in zip(x._fields, x)}
    if isinstance(x, (list, tuple)):
        return tuple(_as_plain(v) for v in x)
    return x


def _portable(fn):
    return lambda *a: _as_plain(fn(*a))


def export_bundle(
    dst: str | os.PathLike,
    entries: Mapping[str, tuple[Callable, Sequence]],
    meta: Mapping[str, Any] | None = None,
    platforms: Sequence[str] | None = None,
) -> str:
    """Serialize named jitted functions into one bundle file.

    ``entries``: ``{name: (fn, example_args)}`` — ``example_args`` may be
    real arrays or ``jax.ShapeDtypeStruct`` specs (no data needed).
    ``meta``: extra keys merged into ``meta.json``. Returns ``dst``.
    """
    from jax import export as jexport

    if not entries:
        raise_error("export_bundle: no entries to export")
    meta_out: dict = {"format": FORMAT, "jax_version": jax.__version__}
    if meta:
        meta_out.update(meta)
    meta_out["entries"] = {}
    blobs: dict[str, bytes] = {}
    for name, (fn, args) in entries.items():
        exp = jexport.export(_ensure_jit(fn), platforms=platforms)(*args)
        blobs[name] = bytes(exp.serialize())
        meta_out["entries"][name] = {
            "inputs": _leaf_specs(args),
            "platforms": list(exp.platforms),
            "nr_devices": int(exp.nr_devices),
        }
    with zipfile.ZipFile(os.fspath(dst), "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta_out, indent=1))
        for name, blob in blobs.items():
            z.writestr(name + ".stablehlo", blob)
    return os.fspath(dst)


class ExportedBundle:
    """A loaded bundle: ``meta`` (dict), ``names`` (entry list),
    ``call(name, *args)``. Deserialization is per-entry lazy; the first
    ``call`` compiles for the local backend."""

    def __init__(self, path: str, meta: dict, blobs: Mapping[str, bytes]):
        self.path = path
        self.meta = meta
        self._blobs = dict(blobs)
        self._loaded: dict[str, Any] = {}

    @property
    def names(self) -> list[str]:
        return sorted(self._blobs)

    def _check(self, name: str) -> None:
        if name not in self._blobs:
            raise_error(
                "bundle '{}' has no entry '{}' (have: {})",
                self.path, name, ", ".join(self.names),
            )

    def _entry(self, name: str):
        if name not in self._loaded:
            from jax import export as jexport

            self._check(name)
            self._loaded[name] = jexport.deserialize(bytearray(self._blobs[name]))
        return self._loaded[name]

    def call(self, name: str, *args):
        return self._entry(name).call(*args)

    def make_mesh(self):
        """Rebuild the export-time mesh shape from local devices (meshed
        bundles only; raises when this process has too few devices)."""
        axes = self.meta.get("mesh")
        if not axes:
            raise_error("bundle '{}' is not a meshed export (no meta['mesh'])", self.path)
        from jax.sharding import Mesh

        n = int(np.prod(list(axes.values())))
        devs = jax.devices()
        if len(devs) < n:
            raise_error(
                "bundle '{}' was exported for a {}-device mesh {}; this "
                "process has {} device(s)", self.path, n, dict(axes), len(devs),
            )
        return Mesh(np.array(devs[:n]).reshape(tuple(axes.values())), tuple(axes))

    def call_sharded(self, name: str, params, *args):
        """Meshed-bundle convenience: place ``params`` with the same
        default rules the exporting model used (``parallel.shard_params``
        — replicated, tp-sharded where the rules say so) and dp-shard the
        batch-leading array args, then call. ``params`` is the dict
        ``load_weights`` returns."""
        from .parallel import batch_sharding, shard_params

        mesh = self.make_mesh()
        placed = shard_params(params, mesh)
        bs = batch_sharding(mesh)
        placed_args = tuple(jax.device_put(a, bs) for a in args)
        return self.call(name, placed, *placed_args)

    def input_specs(self, name: str) -> list:
        """Flattened ``[shape, dtype]`` list recorded at export time (read
        from meta.json — does not deserialize the program)."""
        self._check(name)
        return self.meta["entries"][name]["inputs"]


def load_bundle(src: str | os.PathLike) -> ExportedBundle:
    """Open a bundle written by ``export_bundle`` / ``export_model``."""
    path = os.fspath(src)
    with zipfile.ZipFile(path, "r") as z:
        names = set(z.namelist())
        if "meta.json" not in names:
            raise_error("'{}' is not a vision_tpu export bundle (no meta.json)", path)
        meta = json.loads(z.read("meta.json"))
        if meta.get("format") != FORMAT:
            raise_error(
                "'{}' has unknown bundle format {!r} (expected {!r})",
                path, meta.get("format"), FORMAT,
            )
        blobs = {
            n[: -len(".stablehlo")]: z.read(n)
            for n in names
            if n.endswith(".stablehlo")
        }
    return ExportedBundle(path, meta, blobs)


# ---------------------------------------------------------------------------
# family-aware model export


def _embed(fn, params):
    """Close the weights over the program (they become StableHLO consts)."""
    return jax.jit(lambda *rest: fn(params, *rest))


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def export_model(
    model,
    dst: str | os.PathLike,
    extent: tuple[int, int] | None = None,
    batch: int = 1,
    embed_params: bool = True,
    platforms: Sequence[str] | None = None,
    entries: Sequence[str] | None = None,
) -> list[str]:
    """Export a high-level Model's jitted executables as a bundle.

    ``entries`` selects a subset of the family's entry names (default:
    all) — e.g. ``("encode",)`` for a SAM bundle that only serves the
    encoder.

    ``extent`` (w, h) picks the input geometry for the extent-dynamic
    families: birefnet / depth-anything snap it to their valid grids
    exactly like their ``compute`` does; esrgan takes it verbatim (its
    trunk has no grid — pick the extents you will serve). Fixed-input
    families (sam 1024², migan ``resolution``², yolo ``input_size``²,
    sam3 ``image_size``²) ignore it. ``batch`` sets the leading axis of
    the image-input entries (SAM decode and sam3 text entries stay
    per-item — see ``meta["entries"][*]["inputs"]``).
    Returns the entry names written. See the module docstring for the
    call signatures; inputs are the SAME u8 device arrays the model
    programs consume (preprocessing fused in-program).
    """
    import jax.numpy as jnp

    if batch < 1:
        raise_error("export_model: batch must be >= 1, got {}", batch)
    kind = type(model).__name__
    mesh = getattr(model, "mesh", None)
    if mesh is not None:
        # dp-sharded export: supported for SamModel (the serving case) —
        # its top-level sharded program takes the param dict directly, so
        # the loader can reproduce the placement with shard_params. The
        # other families' sharded programs close over derived weight forms
        # (packed/stacked); export those unmeshed and shard at the call
        # site (module docstring).
        if kind != "SamModel":
            raise_error(
                "export_model: meshed {} doesn't export — dp-sharded export "
                "is supported for SamModel only; construct without a mesh "
                "and shard at the call site", kind,
            )
        if embed_params:
            raise_error(
                "export_model: a meshed export takes the param dict at call "
                "time (call_sharded places it on the mesh); pass "
                "embed_params=False"
            )
        dp = dict(mesh.shape).get("dp", 1)
        if batch % dp:
            raise_error(
                "export_model: batch {} must divide over the mesh dp axis "
                "({})", batch, dp,
            )
    params = model.params
    meta: dict = {"family": kind, "batch": batch, "params_embedded": embed_params}
    if mesh is not None:
        meta["mesh"] = {str(k): int(v) for k, v in mesh.shape.items()}
    programs: dict[str, tuple[Callable, tuple]] = {}

    def add(name, fn, *args):
        fn = _portable(fn)  # NamedTuple outputs -> plain dicts
        if embed_params:
            programs[name] = (_embed(fn, params), tuple(args))
        else:
            programs[name] = (jax.jit(fn), (params,) + tuple(args))

    if kind == "SamModel":
        s = model.p.image_size
        x1 = _sds((1, s, s, 3), jnp.uint8)
        embed_spec = jax.eval_shape(model._enc_single, params, x1)
        coords = _sds((2, 2), jnp.float32)
        if mesh is not None:
            if any(v > 1 for k, v in mesh.shape.items() if k != "dp"):
                raise_error(
                    "export_model: meshed SAM export supports dp-only meshes "
                    "(got {}) — tp/sp placements are not reproducible from "
                    "the GGUF param dict at load time", dict(mesh.shape),
                )
            # encode = the model's dp-sharded program (batch splits over
            # dp, params replicated); decode entries export as plain
            # 1-device per-prompt programs (a batch-1 embedding can't
            # shard over dp) — the loader calls encode via call_sharded
            # and decode via call
            p_specs = {k: _sds(np.shape(v), v.dtype) for k, v in params.items()}
            programs["encode"] = (model._enc, (p_specs, _sds((batch, s, s, 3), jnp.uint8)))
            programs["decode_point"] = (
                jax.jit(_portable(model._dec_point)), (p_specs, embed_spec, coords)
            )
            programs["decode_box"] = (
                jax.jit(_portable(model._dec_box)), (p_specs, embed_spec, coords)
            )
        else:
            # ``batch`` sizes the encode entry; the decode entries are
            # per-prompt (one embedding + one prompt, the model's own decode
            # granularity) — per-entry shapes are in meta["entries"][*]["inputs"]
            add("encode", model._enc_single, _sds((batch, s, s, 3), jnp.uint8))
            add("decode_point", model._dec_point, embed_spec, coords)
            add("decode_box", model._dec_box, embed_spec, coords)
        meta["image_size"] = s
    elif kind == "EsrganModel":
        if not embed_params:
            raise_error(
                "export_model: esrgan always embeds its (packed) weights — "
                "the trunk consumes a derived packed form, not the GGUF "
                "param dict; drop embed_params=False"
            )
        w, h = extent or (1024, 1024)
        fn = model._fn(("whole", (w, h)), True, (w, h))  # closes over packed
        programs["upscale"] = (jax.jit(lambda x: fn(x)), (_sds((batch, h, w, 3), jnp.uint8),))
        meta.update(extent=[w, h], scale=model.p.scale)
    elif kind == "BirefnetModel":
        from .models.birefnet import birefnet_image_extent

        w, h = birefnet_image_extent(extent or (1024, 1024), model.p, model.device.max_alloc)
        add("forward", model._fn((w, h)), _sds((batch, h, w, 3), jnp.uint8))
        meta["extent"] = [w, h]
    elif kind == "DepthAnythingModel":
        from .models.depth_anything import depthany_image_extent

        w, h = depthany_image_extent(extent or (518, 518), model.p)
        add("forward", model._fn((w, h)), _sds((batch, h, w, 3), jnp.uint8))
        meta["extent"] = [w, h]
    elif kind == "MiganModel":
        r = model.p.resolution
        add(
            "forward", model._run,
            _sds((batch, r, r, 3), jnp.uint8), _sds((batch, r, r, 1), jnp.uint8),
        )
        meta["resolution"] = r
    elif kind == "Yolov9tModel":
        s = model.p.input_size
        add("forward", model._run, _sds((batch, s, s, 3), jnp.uint8))
        meta["input_size"] = s
    elif kind == "Sam3Model":
        s = model._vp.image_size
        t = model.max_tokens
        dtype = model.device.preferred_float_type
        stack = model._vision_stack()  # also drops the flat window copies
        params = model.params  # re-read: _vision_stack rebinds the view

        def vision(p_, st_, x_):
            return _as_plain(model._vision_fn(p_, st_, x_))

        text = _portable(model._text_fn)
        # the vision trunk is batch-general; text encode is per-prompt
        # (one (1, t) token row, the model's encode_text granularity)
        x_spec = _sds((batch, s, s, 3), dtype)
        if embed_params:
            programs["encode_vision"] = (jax.jit(lambda x: vision(params, stack, x)), (x_spec,))
            programs["encode_text"] = (
                _embed(text, params),
                (_sds((1, t), jnp.int32), _sds((t, t), jnp.float32)),
            )
        else:
            programs["encode_vision"] = (jax.jit(vision), (params, stack, x_spec))
            programs["encode_text"] = (
                jax.jit(text),
                (params, _sds((1, t), jnp.int32), _sds((t, t), jnp.float32)),
            )
        meta.update(image_size=s, max_tokens=t)
    else:
        raise_error("export_model: unsupported model type '{}'", kind)
    if entries is not None:
        unknown = sorted(set(entries) - set(programs))
        if unknown:
            raise_error(
                "export_model: unknown entries {} for {} (have: {})",
                ", ".join(unknown), kind, ", ".join(sorted(programs)),
            )
        programs = {k: v for k, v in programs.items() if k in set(entries)}
        if not programs:
            raise_error("export_model: entries selected nothing to export")
    export_bundle(dst, programs, meta=meta, platforms=platforms)
    return sorted(programs)

"""Per-family fine-tuning recipes (the ``vision-cli finetune`` verb).

Composes the training subsystem end-to-end on top of a deployable GGUF:
load -> fine-tune -> export. Recipes: Real-ESRGAN (self-supervised SR —
random HR patches, bicubic LR synthesized ON DEVICE inside the jitted
step, L1(model(LR), HR)), BiRefNet (supervised masks — same-stem
(image, mask) pairs, BCE + soft-IoU, the ops.augment ops composed into
the jitted step), and Depth-Anything distillation (teacher pseudo-depth,
scale/shift-invariant L1). The reference is inference-only; this closes
the loop its users run through external torch training code.

TPU notes: the whole step (degrade + forward + backward + update) is ONE
jitted program; host threads only decode images and crop patches
(train.data_loader), and ``prefetch_to_device`` overlaps H2D with
compute. Patches are a fixed size, so there is exactly one compile.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .core.errors import raise_error

__all__ = ["distill_depthany", "finetune", "finetune_birefnet", "finetune_esrgan", "list_images"]

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tga", ".gif")


def list_images(inputs: Sequence[str]) -> list[str]:
    """Expand files/directories into a sorted list of image paths."""
    out: list[str] = []
    for item in inputs:
        if os.path.isdir(item):
            out.extend(
                os.path.join(item, f)
                for f in sorted(os.listdir(item))
                if f.lower().endswith(_IMG_EXTS)
            )
        else:
            out.append(item)
    if not out:
        raise_error("finetune: no images found in {}", list(inputs))
    return out


def _patch_load(patch: int, seed: int) -> Callable[[tuple], np.ndarray]:
    """Decode one image and cut a random (patch, patch, 3) f32 crop in
    [0, 1]; images smaller than the patch are reflect-padded first.

    Items are ``(index, path)`` pairs and the crop rng is keyed on
    ``(seed, index)`` — deterministic per (epoch seed, item) regardless of
    data_loader's worker-thread scheduling, so a fine-tune run reproduces
    bit-exactly from its ``seed`` argument."""
    from .image import image_load

    def load(item: tuple) -> np.ndarray:
        idx, path = item
        a = image_load(path).load_f32x4()[:, :, :3]
        h, w, _ = a.shape
        if h < patch or w < patch:
            a = np.pad(
                a,
                ((0, max(0, patch - h)), (0, max(0, patch - w)), (0, 0)),
                mode="reflect",
            )
            h, w, _ = a.shape
        rng = np.random.default_rng([seed, idx])
        y0 = int(rng.integers(0, h - patch + 1))
        x0 = int(rng.integers(0, w - patch + 1))
        return np.ascontiguousarray(a[y0 : y0 + patch, x0 : x0 + patch])

    return load


def _ckpt_resume(tree, ckpt_dir, log):
    """Resume ``tree`` (a TrainState or a (state, ema) pair) from the
    newest ``step_*`` checkpoint under ``ckpt_dir``. Returns
    ``(tree, done)`` — ``done`` = optimizer steps already taken."""
    if not ckpt_dir:
        return tree, 0
    from .train import TrainState, latest_checkpoint, restore_checkpoint

    latest = latest_checkpoint(ckpt_dir)
    if latest is None:
        return tree, 0
    tree = restore_checkpoint(latest, tree)
    # NB: TrainState is itself a (named) tuple — test the type, not tuple-ness
    state = tree if isinstance(tree, TrainState) else tree[0]
    done = int(state.step)
    if log is not None:
        log(f"resumed from {latest} (step {done})")
    return tree, done


def _ckpt_save(tree, ckpt_dir, every, done, steps):
    """Periodic + final checkpoint (durable before returning — a
    preempted process resumes from its last save)."""
    if ckpt_dir and (done % max(int(every), 1) == 0 or done >= steps):
        from .train import save_checkpoint

        save_checkpoint(
            os.path.join(os.fspath(ckpt_dir), f"step_{done}"), tree
        )


def finetune_esrgan(
    model,
    images: Sequence[str],
    dst: str | os.PathLike,
    steps: int = 200,
    lr: float = 1e-4,
    batch: int = 4,
    patch: int = 64,
    ema_decay: float | None = None,
    trainable=None,
    seed: int = 0,
    device=None,
    mesh=None,
    workers: int = 4,
    ckpt_dir: str | os.PathLike | None = None,
    ckpt_every: int = 50,
    log: Callable[[str], None] | None = None,
) -> dict:
    """Self-supervised SR fine-tune of an ESRGAN GGUF on a folder of images.

    Each step samples ``batch`` random ``patch``-sized HR crops, bicubic-
    downscales them by the model's scale factor on device, and takes one
    adam step on ``L1(esrgan(LR), HR)``. ``ema_decay`` additionally tracks
    EMA weights (what Real-ESRGAN ships) and exports those. Writes the
    fine-tuned params to ``dst`` (f32, carries the source KVs) and returns
    ``{"out", "steps", "first_loss", "last_loss"}``.

    ``ckpt_dir`` makes long runs preemption-safe: the (state, EMA) pair
    checkpoints every ``ckpt_every`` steps (orbax, durable before the
    next step) and a rerun with the same ``ckpt_dir`` resumes from the
    newest ``step_*`` save. The data order restarts from ``seed`` on
    resume (the optimizer/EMA state is what carries over).
    """
    import optax

    from .core.gguf import GGUFFile
    from .core.params import Params
    from .core.weights import load_weights
    from .models.esrgan import esrgan_detect_params, esrgan_generate
    from .ops.resize import resize_nhwc
    from .train import (
        create_train_state,
        data_loader,
        ema_update,
        export_gguf,
        make_train_step,
        prefetch_to_device,
    )

    file = model if isinstance(model, GGUFFile) else GGUFFile(os.fspath(model))
    p = esrgan_detect_params(file)
    if patch % p.scale:
        raise_error(
            "finetune: patch size {} must be divisible by the model scale {}",
            patch, p.scale,
        )
    if steps < 1 or batch < 1:
        raise_error("finetune: steps and batch must be >= 1, got {} / {}", steps, batch)
    images = list(images)
    # training wants f32 master weights (export casts to the target type)
    params = load_weights(file, device, float_dtype=jnp.float32)
    lo = patch // p.scale

    def loss_fn(params, hr):
        lr_img = resize_nhwc(hr, (lo, lo), method="bicubic")
        sr = esrgan_generate(Params(params), lr_img, p)
        return jnp.mean(jnp.abs(sr - hr))

    opt = optax.adam(lr)
    state = create_train_state(params, opt, mesh=mesh, trainable=trainable)
    step = make_train_step(loss_fn, opt, mesh=mesh, trainable=trainable)
    # EMA starts as a COPY: make_train_step donates the state, so aliasing
    # state.params here would leave ema holding deleted buffers after step 1
    ema = (
        jax.tree_util.tree_map(lambda x: jnp.array(x), dict(state.params))
        if ema_decay is not None
        else None
    )
    ema_step = jax.jit(ema_update, static_argnames=("decay",)) if ema_decay is not None else None

    tree, done = _ckpt_resume(
        (state, ema) if ema is not None else state, ckpt_dir, log
    )
    if ema is not None:
        state, ema = tree
    else:
        state = tree
    first = last = None
    rng = np.random.default_rng(seed)
    # a folder smaller than one batch still trains: sample with
    # replacement up to the batch size (the random crop differs per draw)
    items = (
        list(images)
        if len(images) >= batch
        else [images[i % len(images)] for i in range(batch)]
    )
    while done < steps:
        ep_seed = int(rng.integers(2**31))
        epoch = data_loader(
            list(enumerate(items)), batch, load=_patch_load(patch, ep_seed),
            workers=workers, shuffle=True, seed=ep_seed,
        )
        got = False
        for hr in prefetch_to_device(epoch, mesh=mesh):
            got = True
            state, metrics = step(state, hr)
            if ema is not None:
                ema = ema_step(ema, state.params, decay=ema_decay)
            loss = float(metrics["loss"])
            last = loss
            if first is None:
                first = loss
            done += 1
            _ckpt_save(
                (state, ema) if ema is not None else state,
                ckpt_dir, ckpt_every, done, steps,
            )
            if log is not None and (done == 1 or done % 10 == 0 or done == steps):
                log(f"step {done}/{steps}  loss {loss:.5f}")
            if done >= steps:
                break
        if not got:
            raise_error("finetune: dataset produced no batches")
    out = dict(ema) if ema is not None else dict(state.params)
    export_gguf(out, dst, source=file)
    return {"out": os.fspath(dst), "steps": done, "first_loss": first, "last_loss": last}


def _ssi_normalize(d, eps: float = 1e-6):
    """Per-image scale-and-shift-invariant normalization (MiDaS eq. 5-6):
    subtract the median, divide by the mean absolute deviation. Makes the
    distillation loss blind to the affine depth ambiguity between teacher
    and student."""
    n = d.shape[0]
    flat = d.reshape(n, -1).astype(jnp.float32)
    med = jnp.median(flat, axis=1, keepdims=True)
    dev = jnp.mean(jnp.abs(flat - med), axis=1, keepdims=True)
    return (flat - med) / (dev + eps)


def _resize_load(size: int) -> Callable[[str], np.ndarray]:
    """Decode one image, square-resize to (size, size), ImageNet-normalize
    — host-thread half of the distillation input pipeline (the same
    preprocessing contract as depthany_process_input, fixed-square so the
    step compiles once)."""
    from .image import (
        ImageFormat,
        image_load,
        image_scale,
        image_u8_to_f32,
        preprocess_scale_method,
    )
    from .ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

    def load(path: str) -> np.ndarray:
        img = image_load(path)
        if img.extent != (size, size):
            img = image_scale(img, (size, size), preprocess_scale_method())
        out = image_u8_to_f32(
            img,
            ImageFormat.rgb_f32,
            offset=tuple(-m for m in IMAGENET_MEAN),
            scale=tuple(1.0 / s for s in IMAGENET_STD),
        )
        return np.ascontiguousarray(out.data[:, :, :3])

    return load


def distill_depthany(
    teacher,
    student,
    images: Sequence[str],
    dst: str | os.PathLike,
    steps: int = 200,
    lr: float = 1e-4,
    batch: int = 4,
    size: int = 252,
    trainable=None,
    lora_rank: int | None = None,
    lora_out: str | os.PathLike | None = None,
    qlora: bool = False,
    seed: int = 0,
    device=None,
    mesh=None,
    workers: int = 4,
    ckpt_dir: str | os.PathLike | None = None,
    ckpt_every: int = 50,
    log: Callable[[str], None] | None = None,
) -> dict:
    """Knowledge distillation for Depth-Anything: train a small student
    GGUF against a larger teacher's pseudo-depth on unlabeled images —
    exactly the pseudo-labeling loop the Depth-Anything paper trains with,
    reduced to its self-supervised core.

    ``lora_rank`` switches to parameter-efficient distillation: LoRA
    adapters (vision_tpu.lora) attach to every linear in the student's
    DINOv2 trunk + DPT neck, ONLY the adapters train (optimizer state
    shrinks accordingly), and the export merges them back in —
    numerically a plain deployable file. ``lora_out`` additionally saves
    the unmerged adapters as a tiny GGUF adapter file
    (``lora.load_lora`` re-attaches them to the pristine student).

    Each step resizes ``batch`` images to ``size``² (must be a multiple of
    the 14-px patch), runs the FROZEN teacher to get a pseudo-depth target,
    and takes one adam step on the scale-and-shift-invariant L1 between
    student and teacher depth (both per-image median/MAD normalized, so the
    affine depth ambiguity cancels). The teacher forward is its OWN jitted
    program with the teacher params as arguments — closing over them in the
    train step would constant-fold hundreds of MB of weights into the
    student's program. Writes the student to ``dst`` (f32, student KVs) and
    returns ``{"out", "steps", "first_loss", "last_loss"}``. ``ckpt_dir``
    checkpoints the student state every ``ckpt_every`` steps and resumes
    a rerun from the newest save (data order restarts from ``seed``).
    """
    import optax

    from .core.gguf import GGUFFile
    from .core.params import Params
    from .core.weights import load_weights
    from .models.depth_anything import (
        depthany_detect_params,
        depthany_predict,
        fixup_weights,
    )
    from .train import (
        create_train_state,
        data_loader,
        export_gguf,
        make_train_step,
        prefetch_to_device,
    )

    tfile = teacher if isinstance(teacher, GGUFFile) else GGUFFile(os.fspath(teacher))
    sfile = student if isinstance(student, GGUFFile) else GGUFFile(os.fspath(student))
    tp, sp = depthany_detect_params(tfile), depthany_detect_params(sfile)
    mult = max(tp.image_multiple, sp.image_multiple)
    if size % mult or size < mult:
        raise_error(
            "distill: size {} must be a positive multiple of the patch "
            "size {}", size, mult,
        )
    if steps < 1 or batch < 1:
        raise_error("distill: steps and batch must be >= 1, got {} / {}", steps, batch)
    images = list(images)
    # load host-side so the converter-layout fixup (always-cwhn
    # patch_embed/projection convs in whcn files) applies before placement
    t_np = fixup_weights(tfile, load_weights(tfile, device=None, as_numpy=True))
    s_np = fixup_weights(sfile, load_weights(sfile, device=None, as_numpy=True, float_dtype=jnp.float32))
    if qlora and lora_rank is None:
        raise_error("distill: qlora requires lora_rank (the base is frozen quantized)")
    if lora_rank is not None:
        from .lora import LORA_TRAINABLE, add_lora

        if trainable is not None:
            raise_error("distill: pass either lora_rank or trainable, not both")
        if lora_rank < 1:
            raise_error("distill: lora_rank must be >= 1, got {}", lora_rank)
        if qlora:
            # QLoRA: block-quantize the student base in memory; adapters
            # attach next to the integer-resident (frozen) weights
            from .core.quant import quantize_store

            s_np = quantize_store(s_np, dtype="float32")
        s_np = add_lora(s_np, rank=lora_rank, seed=seed)
        trainable = LORA_TRAINABLE
    from .core.quant import QuantResident as _QR

    s_params = {
        k: v if isinstance(v, _QR) else jnp.asarray(v) for k, v in s_np.items()
    }
    # frozen teacher runs at the device's inference dtype (bf16 on TPU):
    # place f32 host arrays, cast on device (NOTES.md: host bf16 is slow)
    t_dtype = device.preferred_float_type if device is not None else jnp.float32
    dev = device.jax_device if device is not None else None

    def _place_t(v):
        a = jax.device_put(v, dev) if dev is not None else jnp.asarray(v)
        return a.astype(t_dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

    if mesh is not None:
        from .parallel.sharding import shard_params

        t_params = shard_params(t_np, mesh)
        t_dtype = next(
            (v.dtype for v in t_params.values() if jnp.issubdtype(v.dtype, jnp.floating)),
            jnp.float32,
        )
    else:
        t_params = {k: _place_t(v) for k, v in t_np.items()}

    def teacher_fwd(t, x):
        return depthany_predict(Params(t), x.astype(t_dtype), tp)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        tfwd = jax.jit(
            teacher_fwd, in_shardings=(None, NamedSharding(mesh, P("dp")))
        )
    else:
        tfwd = jax.jit(teacher_fwd)

    def loss_fn(params, batch):
        x, target = batch
        s = depthany_predict(Params(params), x, sp)
        return jnp.mean(jnp.abs(_ssi_normalize(s) - _ssi_normalize(target)))

    opt = optax.adam(lr)
    state = create_train_state(s_params, opt, mesh=mesh, trainable=trainable)
    step = make_train_step(loss_fn, opt, mesh=mesh, trainable=trainable)

    state, done = _ckpt_resume(state, ckpt_dir, log)
    first = last = None
    rng = np.random.default_rng(seed)
    items = (
        list(images)
        if len(images) >= batch
        else [images[i % len(images)] for i in range(batch)]
    )
    while done < steps:
        epoch = data_loader(
            items, batch, load=_resize_load(size), workers=workers,
            shuffle=True, seed=int(rng.integers(2**31)),
        )
        got = False
        for x in prefetch_to_device(epoch, mesh=mesh):
            got = True
            target = tfwd(t_params, x)
            state, metrics = step(state, (x, target))
            loss = float(metrics["loss"])
            last = loss
            if first is None:
                first = loss
            done += 1
            _ckpt_save(state, ckpt_dir, ckpt_every, done, steps)
            if log is not None and (done == 1 or done % 10 == 0 or done == steps):
                log(f"step {done}/{steps}  loss {loss:.5f}")
            if done >= steps:
                break
        if not got:
            raise_error("distill: dataset produced no batches")
    out_params = dict(state.params)
    if lora_rank is not None:
        from .lora import merge_lora, save_lora

        if lora_out is not None:
            save_lora(out_params, lora_out, arch=sfile.arch)
        out_params = merge_lora(out_params)
    export_gguf(out_params, dst, source=sfile)
    result = {"out": os.fspath(dst), "steps": done, "first_loss": first, "last_loss": last}
    if lora_rank is not None and lora_out is not None:
        result["lora_out"] = os.fspath(lora_out)
    return result


def _mask_load(size: int) -> Callable[[tuple], tuple]:
    """Host half of the mask-finetune pipeline: decode one (image, mask)
    pair, square-resize both to ``size``², return ``(rgb [0,1] f32,
    mask (H, W, 1) [0,1] f32)``. The image goes UN-normalized — the
    device step jitters it first and fuses the ImageNet normalize (the
    augment ops' [0, 1] contract). Masks route through the eval loaders
    (grayscale PNG / .npy / color all work — evaluate._load_map)."""
    from .evaluate import _gray, _load_map, _resize_to
    from .image import ImageFormat, image_load, image_scale, image_u8_to_f32, preprocess_scale_method

    def load(pair: tuple) -> tuple:
        img_p, mask_p = pair
        img = image_load(img_p)
        if img.extent != (size, size):
            img = image_scale(img, (size, size), preprocess_scale_method())
        x = image_u8_to_f32(img, ImageFormat.rgb_f32).data[:, :, :3]
        m = _resize_to(_gray(_load_map(mask_p)), (size, size))[:, :, None]
        return np.ascontiguousarray(x), np.ascontiguousarray(np.clip(m, 0.0, 1.0))

    return load


def finetune_birefnet(
    model,
    images: Sequence[str],
    dst: str | os.PathLike,
    masks: str | None = None,
    steps: int = 200,
    lr: float = 1e-4,
    batch: int = 4,
    size: int = 256,
    augment: bool = True,
    trainable=None,
    lora_rank: int | None = None,
    lora_out: str | os.PathLike | None = None,
    qlora: bool = False,
    seed: int = 0,
    device=None,
    mesh=None,
    workers: int = 4,
    ckpt_dir: str | os.PathLike | None = None,
    ckpt_every: int = 50,
    log: Callable[[str], None] | None = None,
) -> dict:
    """Supervised mask fine-tune of a BiRefNet GGUF on labeled
    (image, mask) pairs — the third family recipe (VERDICT r4 next #4a):
    segmentation/matting users adapt the released checkpoint to their
    domain with a folder of images + same-stem masks (the
    ``bulk.pair_masks`` convention; masks are grayscale images or .npy
    float arrays in [0, 1]).

    Each step resizes ``batch`` pairs to ``size``² (snapped to the
    model's ``image_multiple`` grid), augments ON DEVICE inside the
    jitted train step (consistent horizontal flip of image+mask, color
    jitter on the image only — ``ops.augment``, keyed per batch so runs
    reproduce from ``seed``), ImageNet-normalizes, and takes one adam
    step on BCE + soft-IoU of ``birefnet_predict`` against the mask (the
    standard DIS/matting objective). ``lora_rank`` trains only LoRA
    adapters (SWIN trunk linears + decoder lateral/attn 1x1 convs) and
    merges them into the export; ``lora_out`` additionally saves the
    adapter file. Writes the tuned model to ``dst`` (f32, source KVs) and
    returns ``{"out", "steps", "first_loss", "last_loss"}``. ``ckpt_dir``
    checkpoints the train state every ``ckpt_every`` steps and resumes a
    rerun from the newest save (data order restarts from ``seed``).
    """
    import optax

    from .bulk import pair_masks
    from .core.gguf import GGUFFile
    from .core.params import Params
    from .core.weights import load_weights
    from .models.birefnet import (
        _next_multiple,
        birefnet_detect_params,
        birefnet_predict,
        fixup_weights,
    )
    from .ops.augment import color_jitter, random_flip
    from .ops.preprocess import IMAGENET_MEAN, IMAGENET_STD
    from .train import (
        create_train_state,
        data_loader,
        export_gguf,
        make_train_step,
        prefetch_to_device,
    )

    file = model if isinstance(model, GGUFFile) else GGUFFile(os.fspath(model))
    bp = birefnet_detect_params(file)
    if masks is None:
        raise_error("finetune(birefnet): pass masks=<dir of same-stem ground-truth masks>")
    if steps < 1 or batch < 1:
        raise_error("finetune: steps and batch must be >= 1, got {} / {}", steps, batch)
    s = _next_multiple(max(int(size), bp.image_multiple), bp.image_multiple)
    if s != size and log is not None:
        log(f"size {size} -> {s} (model grid: multiples of {bp.image_multiple})")
    pairs = pair_masks(list(images), masks)

    s_np = fixup_weights(file, load_weights(file, device=None, as_numpy=True, float_dtype=jnp.float32))
    if qlora and lora_rank is None:
        raise_error("finetune: qlora requires lora_rank (the base is frozen quantized)")
    if lora_rank is not None:
        from .lora import LORA_TRAINABLE, add_lora

        if trainable is not None:
            raise_error("finetune: pass either lora_rank or trainable, not both")
        if lora_rank < 1:
            raise_error("finetune: lora_rank must be >= 1, got {}", lora_rank)
        if qlora:
            from .core.quant import quantize_store

            s_np = quantize_store(s_np, dtype="float32")
        s_np = add_lora(s_np, rank=lora_rank, seed=seed)
        trainable = LORA_TRAINABLE
    from .core.quant import QuantResident as _QR

    params = {
        k: v if isinstance(v, _QR) else jnp.asarray(v) for k, v in s_np.items()
    }
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    def loss_fn(params, batch):
        x, m, keys = batch
        if augment:
            kf, kj = jax.random.split(keys[0])
            both = random_flip(kf, jnp.concatenate([x, m], axis=-1))
            x, m = both[..., :3], both[..., 3:]
            x = color_jitter(kj, x, brightness=0.2, contrast=0.2, saturation=0.2)
        pm = birefnet_predict(Params(params), (x - mean) / std, bp)
        eps = 1e-6
        bce = -jnp.mean(m * jnp.log(pm + eps) + (1 - m) * jnp.log(1 - pm + eps))
        inter = jnp.sum(pm * m, axis=(1, 2, 3))
        union = jnp.sum(pm, axis=(1, 2, 3)) + jnp.sum(m, axis=(1, 2, 3)) - inter
        iou = jnp.mean((inter + 1.0) / (union + 1.0))
        return bce + (1.0 - iou)

    opt = optax.adam(lr)
    state = create_train_state(params, opt, mesh=mesh, trainable=trainable)
    step = make_train_step(loss_fn, opt, mesh=mesh, trainable=trainable)

    state, done = _ckpt_resume(state, ckpt_dir, log)
    first = last = None
    rng = np.random.default_rng(seed)
    items = (
        list(pairs)
        if len(pairs) >= batch
        else [pairs[i % len(pairs)] for i in range(batch)]
    )

    def with_keys(epoch):
        # one augment key per batch, broadcast to (B, 2) u32 rows so the
        # mesh path dp-shards it like every other leaf (loss uses keys[0])
        for x, m in epoch:
            kb = np.tile(
                rng.integers(0, 2**32, 2, dtype=np.uint32), (x.shape[0], 1)
            )
            yield (x, m, kb)

    while done < steps:
        epoch = data_loader(
            items, batch, load=_mask_load(s), workers=workers,
            shuffle=True, seed=int(rng.integers(2**31)),
        )
        got = False
        for b in prefetch_to_device(with_keys(epoch), mesh=mesh):
            got = True
            state, metrics = step(state, b)
            loss = float(metrics["loss"])
            last = loss
            if first is None:
                first = loss
            done += 1
            _ckpt_save(state, ckpt_dir, ckpt_every, done, steps)
            if log is not None and (done == 1 or done % 10 == 0 or done == steps):
                log(f"step {done}/{steps}  loss {loss:.5f}")
            if done >= steps:
                break
        if not got:
            raise_error("finetune: dataset produced no batches")
    out_params = dict(state.params)
    if lora_rank is not None:
        from .lora import merge_lora, save_lora

        if lora_out is not None:
            save_lora(out_params, lora_out, arch=file.arch)
        out_params = merge_lora(out_params)
    export_gguf(out_params, dst, source=file)
    result = {"out": os.fspath(dst), "steps": done, "first_loss": first, "last_loss": last}
    if lora_rank is not None and lora_out is not None:
        result["lora_out"] = os.fspath(lora_out)
    return result


_RECIPES = {"esrgan": finetune_esrgan, "birefnet": finetune_birefnet}


def finetune(model, images: Sequence[str], dst, **kw) -> dict:
    """Family-dispatching fine-tune: detect the GGUF's family and run its
    recipe. Currently: esrgan (self-supervised SR) and birefnet
    (supervised masks — pass ``masks=<dir>``). Other families train
    through the generic ``vision_tpu.train`` API with task-specific
    losses/labels — see docs/training.md."""
    from .api import model_detect_family
    from .core.gguf import GGUFFile

    file = model if isinstance(model, GGUFFile) else GGUFFile(os.fspath(model))
    family = model_detect_family(file).value
    recipe = _RECIPES.get(family)
    if recipe is None:
        raise_error(
            "finetune: no self-supervised recipe for family '{}' (have: {}); "
            "use the vision_tpu.train API with a task loss instead",
            family, ", ".join(sorted(_RECIPES)),
        )
    return recipe(file, images, dst, **kw)

"""Self-supervised fine-tuning recipes (the ``vision-cli finetune`` verb).

Composes the training subsystem end-to-end on top of a deployable GGUF:
load -> fine-tune -> export, with no labels required. The first recipe is
super-resolution (Real-ESRGAN): sample random HR patches from user
images, synthesize the LR input by bicubic downscale ON DEVICE inside
the jitted step, and minimize L1(model(LR), HR) — the standard SR
degradation-training loop reduced to its self-supervised core. The
reference is inference-only; this closes the loop its users run through
external torch training code.

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

__all__ = ["finetune", "finetune_esrgan", "list_images"]

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


def _patch_load(patch: int) -> Callable[[str], np.ndarray]:
    """Decode one image and cut a random (patch, patch, 3) f32 crop in
    [0, 1]; images smaller than the patch are reflect-padded first."""
    from .image import image_load

    def load(path: str) -> np.ndarray:
        a = image_load(path).load_f32x4()[:, :, :3]
        h, w, _ = a.shape
        if h < patch or w < patch:
            a = np.pad(
                a,
                ((0, max(0, patch - h)), (0, max(0, patch - w)), (0, 0)),
                mode="reflect",
            )
            h, w, _ = a.shape
        rng = np.random.default_rng()
        y0 = int(rng.integers(0, h - patch + 1))
        x0 = int(rng.integers(0, w - patch + 1))
        return np.ascontiguousarray(a[y0 : y0 + patch, x0 : x0 + patch])

    return load


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
    log: Callable[[str], None] | None = None,
) -> dict:
    """Self-supervised SR fine-tune of an ESRGAN GGUF on a folder of images.

    Each step samples ``batch`` random ``patch``-sized HR crops, bicubic-
    downscales them by the model's scale factor on device, and takes one
    adam step on ``L1(esrgan(LR), HR)``. ``ema_decay`` additionally tracks
    EMA weights (what Real-ESRGAN ships) and exports those. Writes the
    fine-tuned params to ``dst`` (f32, carries the source KVs) and returns
    ``{"out", "steps", "first_loss", "last_loss"}``.
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

    first = last = None
    done = 0
    rng = np.random.default_rng(seed)
    # a folder smaller than one batch still trains: sample with
    # replacement up to the batch size (the random crop differs per draw)
    items = (
        list(images)
        if len(images) >= batch
        else [images[i % len(images)] for i in range(batch)]
    )
    while done < steps:
        epoch = data_loader(
            items, batch, load=_patch_load(patch), workers=workers,
            shuffle=True, seed=int(rng.integers(2**31)),
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
            if log is not None and (done == 1 or done % 10 == 0 or done == steps):
                log(f"step {done}/{steps}  loss {loss:.5f}")
            if done >= steps:
                break
        if not got:
            raise_error("finetune: dataset produced no batches")
    out = dict(ema) if ema is not None else dict(state.params)
    export_gguf(out, dst, source=file)
    return {"out": os.fspath(dst), "steps": done, "first_loss": first, "last_loss": last}


_RECIPES = {"esrgan": finetune_esrgan}


def finetune(model, images: Sequence[str], dst, **kw) -> dict:
    """Family-dispatching fine-tune: detect the GGUF's family and run its
    recipe. Currently: esrgan (self-supervised SR). Other families train
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

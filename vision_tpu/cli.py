"""Command-line interface.

Re-provision of the reference CLI (src/cli/cli.cpp + the separate YOLO CLI
src/cli/inference_yolov9t.cpp, SURVEY.md A5/A6):

    vision-cli <sam|birefnet|depthany|migan|esrgan|yolov9t> [options]

with the reference's options (-i/-o/-m/-p, --composite, --tile), model
search paths (./models, $VISION_MODEL_DIR, XDG data dirs —
reference cli.cpp:248-282), and per-phase timing printouts
(cli.cpp:203-216,320-325).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

from .core.device import BackendType, backend_init
from .core.errors import VispError

USAGE_COMMANDS = {
    "sam": "MobileSAM image segmentation",
    "birefnet": "BirefNet background removal",
    "depthany": "Depth-Anything depth estimation",
    "migan": "MI-GAN inpainting",
    "esrgan": "ESRGAN/Real-ESRGAN upscaling",
    "yolov9t": "YOLOv9t object detection",
    "serve": "HTTP serving (batched SAM/ESRGAN endpoints)",
    "quantize": "rewrite a .gguf at a different float type (q8_0, q4_0/1, q5_0/1, K-quants, iq4_nl/xs, f16, f32)",
    "info": "inspect a .gguf: metadata, detected family, tensor/type breakdown",
    "compare": "compare two images: RMS (reference image_difference_rms semantics), PSNR, SSIM",
    "eval": "score a prediction directory against ground truth (mask IoU/F1, depth AbsRel/delta1, PSNR/SSIM, detection mAP); with -m, run the model on -i first",
    "finetune": "fine-tune a .gguf on your images: esrgan (self-supervised SR) or birefnet (supervised masks, --masks DIR)",
    "distill": "distill a depth-anything teacher .gguf into a smaller student on unlabeled images",
    "bench": "run the per-model benchmark table (vision-bench analog)",
    "export": "AOT-export a model's compiled programs as a portable StableHLO bundle (.vxp)",
}


class _Timer:
    def __init__(self, label):
        self.label = label

    def __enter__(self):
        print(f"{self.label}... ", end="", flush=True)
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            print(f"done ({time.perf_counter() - self.t0:.2f}s)")
        else:
            print("failed")  # terminate the phase line so the error starts fresh


def find_model(name_or_path: str) -> str:
    """Model search paths (reference find_model, cli.cpp:248-282)."""
    p = Path(name_or_path)
    if p.exists():
        return str(p)
    candidates = [Path("models")]
    if env := os.environ.get("VISION_MODEL_DIR"):
        candidates.append(Path(env))
    xdg = os.environ.get("XDG_DATA_HOME") or (Path.home() / ".local" / "share")
    candidates.append(Path(xdg) / "vision_tpu" / "models")
    for c in candidates:
        if (c / name_or_path).exists():
            return str(c / name_or_path)
    raise VispError(f"Model file not found: {name_or_path}")


def _composite(image, mask, output_path):
    """--composite via foreground estimation (reference cli.cpp:327-347)."""
    from .image import (
        ImageFormat,
        image_estimate_foreground,
        image_f32_to_u8,
        image_save,
        image_u8_to_f32,
    )

    img_f = image_u8_to_f32(image, ImageFormat.rgba_f32)
    mask_f = image_u8_to_f32(mask, ImageFormat.alpha_f32)
    fg = image_estimate_foreground(img_f, mask_f)
    out = image_f32_to_u8(fg, ImageFormat.rgba_u8)
    image_save(out, output_path)
    print(f"-> image composited and saved to {output_path}")


def _profile(args):
    """jax.profiler trace context for the inference phase (--profile DIR);
    a no-op context when the flag is absent."""
    import contextlib

    if not args.profile:
        return contextlib.nullcontext()
    from .utils.profiling import trace

    return trace(args.profile)


def _device(args):
    btype = None
    if args.backend == "cpu":
        btype = BackendType.cpu
    elif args.backend == "tpu":
        btype = BackendType.tpu
    elif args.backend == "gpu":
        btype = BackendType.gpu
    dev = backend_init(btype)
    print(f"Using device: {dev.jax_device} ({dev.type.name}, {dev.preferred_float_type.__name__})")
    return dev


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="vision-cli", description="TPU-native vision model inference"
    )
    parser.add_argument("command", choices=list(USAGE_COMMANDS.keys()), help="model to run")
    parser.add_argument("-i", "--input", nargs="+", default=None, help="input image(s)")
    parser.add_argument("-o", "--output", default=None, help="output file")
    parser.add_argument("-m", "--model", default=None, help="model file (.gguf)")
    parser.add_argument("-p", "--prompt", nargs="+", type=int, default=None, help="prompt coords")
    parser.add_argument("-b", "--backend", default=None, choices=["cpu", "gpu", "tpu"])
    parser.add_argument("--composite", default=None, help="composite input image with mask")
    parser.add_argument("--tile", type=int, default=-1, help="tile size for large images")
    parser.add_argument("--conf", type=float, default=0.25, help="yolo confidence threshold")
    parser.add_argument("--iou", type=float, default=0.45, help="yolo IoU threshold")
    parser.add_argument(
        "--dump", default=None, metavar="DIR",
        help="dump per-layer feature maps as .npy (yolo; reference --dump-keys)",
    )
    parser.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the inference phase into DIR "
             "(view in TensorBoard / Perfetto; SURVEY §5 tracing)",
    )
    parser.add_argument("--port", type=int, default=8000, help="serve: listen port")
    parser.add_argument("--host", default="127.0.0.1", help="serve: bind address")
    parser.add_argument(
        "--esrgan-model", default=None,
        help="serve: additionally load this ESRGAN gguf next to the SAM model",
    )
    parser.add_argument(
        "--batch", type=int, default=None,
        help="serve/bulk: max batch size (default: each service's measured "
        "per-chip optimum — sam 6, esrgan/birefnet/depthany/migan 4, "
        "yolo 8 — times --dp); finetune: training batch size (default 4)",
    )
    parser.add_argument(
        "--dp", type=int, default=0, metavar="N",
        help="serve/bulk/finetune: shard each batch over N chips (data "
        "parallel over ICI; every served family meshes, 0 = single chip)",
    )
    parser.add_argument(
        "--warmup", action="store_true",
        help="serve: compile every service's batched program before listening",
    )
    parser.add_argument(
        "--extra-model", action="append", default=[], metavar="GGUF",
        help="serve: load an additional model (family auto-detected; repeatable)",
    )
    from .core.gguf import REQUANTIZE_TYPES

    parser.add_argument(
        "--type", "-t", default="q8_0",
        choices=list(REQUANTIZE_TYPES),
        help="quantize: target float storage type",
    )
    parser.add_argument(
        "--verify", action="store_true",
        help="quantize: report per-tensor reconstruction error (rel-RMS) "
             "after writing, like llama-quantize's per-tensor stats",
    )
    parser.add_argument(
        "--tensors", action="store_true",
        help="info: also print the full per-tensor table",
    )
    parser.add_argument(
        "--max-rms", type=float, default=None, metavar="T",
        help="compare: exit 2 if RMS exceeds T (scripted regression gating)",
    )
    from .evaluate import TASKS as EVAL_TASKS

    parser.add_argument(
        "--task", default=None, choices=list(EVAL_TASKS),
        help="eval: what the predictions are (default: inferred from the "
             "-m model's family; required when scoring without a model)",
    )
    parser.add_argument(
        "--gt", default=None, metavar="PATH",
        help="eval: ground-truth directory (detection: .txt dir or JSON), "
             "files matched to predictions by stem",
    )
    parser.add_argument(
        "--no-align", action="store_true",
        help="eval: score depth WITHOUT scale/shift-aligning the relative "
             "prediction to the ground truth first",
    )
    parser.add_argument(
        "--pred-out", default=None, metavar="DIR",
        help="eval with -m: keep the generated predictions here "
             "(default: a temporary directory)",
    )
    parser.add_argument(
        "--steps", type=int, default=200, help="finetune: optimizer steps",
    )
    parser.add_argument(
        "--lr", type=float, default=1e-4, help="finetune: adam learning rate",
    )
    parser.add_argument(
        "--patch", type=int, default=64,
        help="finetune: HR patch size (must divide by the model scale)",
    )
    parser.add_argument(
        "--ema", type=float, default=None, metavar="DECAY",
        help="finetune: track+export EMA weights at this decay (e.g. 0.999)",
    )
    parser.add_argument(
        "--adapter", default=None, metavar="GGUF",
        help="merge this LoRA adapter file (save_lora / --lora-out) into "
             "-m at load — ship one base model + few-MB per-task adapters",
    )
    parser.add_argument(
        "--qlora", action="store_true",
        help="distill/finetune(birefnet), with --lora: block-quantize the "
             "frozen base in device memory (QLoRA) — fine-tune footprint "
             "~= quantized base + rank-r adapters",
    )
    parser.add_argument(
        "--ckpt", default=None, metavar="DIR",
        help="finetune/distill: checkpoint the training state here and "
             "auto-resume a rerun from the newest step_* save",
    )
    parser.add_argument(
        "--ckpt-every", type=int, default=50, metavar="N",
        help="finetune/distill: checkpoint every N optimizer steps "
             "(default 50; the final step always saves)",
    )
    parser.add_argument(
        "--train-filter", default=None, metavar="REGEX",
        help="finetune/distill: train only params whose dotted name matches "
             "(default: all float params)",
    )
    parser.add_argument(
        "--student", default=None, metavar="GGUF",
        help="distill: the student model to train (-m is the frozen teacher)",
    )
    parser.add_argument(
        "--size", type=int, default=None,
        help="distill/finetune(birefnet): square training resolution "
             "(snapped to the model's grid; default 252 / 256)",
    )
    parser.add_argument(
        "--masks", default=None, metavar="DIR",
        help="finetune(birefnet): directory of same-stem ground-truth "
             "masks (grayscale image or .npy in [0,1]) for the -i images",
    )
    parser.add_argument(
        "--no-augment", action="store_true",
        help="finetune(birefnet): disable the on-device flip/color-jitter "
             "augmentation",
    )
    parser.add_argument(
        "--lora", type=int, default=None, metavar="RANK",
        help="distill/finetune(birefnet): train LoRA adapters of this rank "
             "instead of full params (merged into the exported file)",
    )
    parser.add_argument(
        "--lora-out", default=None, metavar="GGUF",
        help="distill: with --lora, also save the unmerged adapters as a "
             "tiny GGUF adapter file",
    )
    parser.add_argument(
        "--extent", nargs=2, type=int, default=None, metavar=("W", "H"),
        help="export: input geometry for the extent-dynamic families "
             "(birefnet/depthany snap it to their grids, esrgan takes it "
             "verbatim); fixed-input families ignore it",
    )
    parser.add_argument(
        "--no-embed", action="store_true",
        help="export: program-only bundle (a few MB); call() then takes "
             "the param dict first instead of baking weights in",
    )
    parser.add_argument(
        "--platforms", nargs="+", default=None, metavar="PLAT",
        help="export: lower for these backends (e.g. --platforms cpu tpu "
             "for a multi-platform artifact; default: the current one)",
    )
    parser.add_argument(
        "--bench-args", nargs=argparse.REMAINDER, default=[],
        help="bench: arguments forwarded to vision_tpu.benchmark "
             "(e.g. --bench-args sam-encode-1024 --k 8)",
    )
    args = parser.parse_args(argv)
    if args.input is None and args.command not in (
        "serve", "quantize", "bench", "info", "export"
    ):
        parser.error("-i/--input is required")
    if args.output is None and args.command not in (
        "serve", "quantize", "bench", "info", "compare", "export", "eval"
    ):
        args.output = {
            "finetune": "finetuned.gguf", "distill": "distilled.gguf",
        }.get(args.command)
        if args.output is None:
            # directory input = bulk mode (output is a directory); video
            # input = video mode (output is a video)
            if args.input and os.path.isdir(args.input[0]):
                args.output = "bulk_out"
            else:
                from .video import is_video

                args.output = (
                    "output.mp4" if args.input and is_video(args.input[0]) else "output.png"
                )

    if (
        args.input
        and (args.tile > 0 or args.composite)
        and not os.path.isdir(args.input[0])
    ):
        from .video import is_video

        if is_video(args.input[0]):
            # both options belong to the single-image paths; accepting and
            # ignoring them would surprise (esrgan video frames run through
            # the whole-image server, capped at ~1 MP/frame — see docs/cli.md)
            print(
                "Error: --tile/--composite are not supported in video mode; "
                "esrgan video frames must fit the whole-image server cap "
                "(~1 MP) — for larger frames extract them to a directory and "
                "use bulk mode, which reports and skips over-cap items",
                file=sys.stderr,
            )
            return 1

    if args.command == "compare":
        # host-only metrics — no model, no TPU (reference analog:
        # image_difference_rms, tests/test-image.cpp usage; psnr/ssim are
        # the extra quality metrics utils/metrics.py adds). psnr/ssim are
        # jnp, so pin the CPU backend before any jax op: otherwise the
        # first jnp call opens the axon tunnel, which can hang for minutes
        # when the tunnel is degraded (same contract as backend_init(cpu)).
        backend_init(BackendType.cpu)
        from .image import image_difference_rms, image_load
        from .utils.metrics import psnr, ssim

        if len(args.input) != 2:
            parser.error("compare needs exactly two images: -i A B")
        try:
            a, b = (image_load(p) for p in args.input)
            rms = image_difference_rms(a, b)
        except VispError as e:
            print(f"Error: {e}", file=sys.stderr)
            return 1
        fa, fb = a.load_f32x4()[:, :, :3], b.load_f32x4()[:, :, :3]
        p = float(psnr(fa, fb))
        # SSIM's 11x11 window needs the image to be at least that big
        win = min(11, fa.shape[0], fa.shape[1])
        s = float(ssim(fa, fb, window=win))
        print(f"rms  {rms:.6f}")
        print(f"psnr {p:.2f} dB")
        print(f"ssim {s:.5f}")
        if args.max_rms is not None and rms > args.max_rms:
            print(f"FAIL: rms {rms:.6f} > --max-rms {args.max_rms}", file=sys.stderr)
            return 2
        return 0

    if args.command == "bench":
        # the reference ships vision-bench as its own tool (tests/benchmark.cpp);
        # here it is the benchmark module behind a CLI verb
        from .benchmark import main as bench_main

        bench_main(args.bench_args)
        return 0

    if args.command == "quantize":
        # pure file rewrite — no device, no model load
        from .core.gguf import requantize_gguf

        if not args.model:
            parser.error("quantize requires -m <in.gguf>")
        try:
            src = find_model(args.model)
            dst = args.output
            if dst is None:  # no -o: derive a gguf name next to the source
                dst = str(Path(src).with_suffix("")) + f"-{args.type.upper()}.gguf"
            stats = [] if args.verify else None
            with _Timer(f"Quantizing to {args.type}"):
                out = requantize_gguf(src, dst, args.type, stats_out=stats)
        except VispError as e:
            print(f"Error: {e}", file=sys.stderr)
            return 1
        if stats:
            width = max(len(n) for n, _, _ in stats)
            for n, tname, rms in stats:
                err = "  (int, copied)" if rms is None else f"  rel-rms {rms:.4f}"
                print(f"  {n:<{width}}  {tname:<7}{err}")
            lossy = [r for _, _, r in stats if r]
            if lossy:
                print(f"  worst rel-rms {max(lossy):.4f} over {len(lossy)} quantized tensors")
        print(f"-> {out} ({Path(out).stat().st_size / 1e6:.1f} MB, "
              f"from {Path(src).stat().st_size / 1e6:.1f} MB)")
        return 0

    if args.command == "info":
        # metadata-only inspection — no device, no tensor reads (the mmap'd
        # data section is never touched). Analog of gguf-py's gguf_dump for
        # the files our converter/quantizer write.
        from .api import model_detect_family
        from .core.gguf import model_load

        if not args.model:
            parser.error("info requires -m <model.gguf>")
        try:
            path = find_model(args.model)
            file = model_load(path)
        except VispError as e:
            print(f"Error: {e}", file=sys.stderr)
            return 1
        try:
            family = model_detect_family(file).value
        except VispError:
            family = "unknown"
        ftype = file.float_type
        print(f"{path} ({Path(path).stat().st_size / 1e6:.1f} MB, GGUF v{file.version})")
        print(f"  architecture: {file.arch or '(none)'}  family: {family}")
        print(f"  file type: {getattr(ftype, 'name', ftype)}  alignment: {file.alignment}")
        print(f"  {len(file.metadata)} metadata keys:")
        for key, val in file.metadata.items():
            text = f"[{len(val)} x {type(val[0]).__name__}]" if (
                isinstance(val, list) and len(val) > 8
            ) else repr(val)
            print(f"    {key} = {text}")
        by_type: dict = {}
        total_elems = total_bytes = 0
        for info in file.tensors.values():
            tname = getattr(info.ggml_type, "name", str(info.ggml_type))
            try:
                nbytes = info.n_bytes
            except VispError:
                nbytes = 0  # unknown type: still listed, size unavailable
            cnt, els, byt = by_type.get(tname, (0, 0, 0))
            by_type[tname] = (cnt + 1, els + info.n_elements, byt + nbytes)
            total_elems += info.n_elements
            total_bytes += nbytes
        print(f"  {len(file.tensors)} tensors, {total_elems / 1e6:.1f} M parameters, "
              f"{total_bytes / 1e6:.1f} MB tensor data:")
        for tname, (cnt, els, byt) in sorted(by_type.items(), key=lambda kv: -kv[1][2]):
            print(f"    {tname:<7} {cnt:>4} tensors  {els / 1e6:>8.1f} M  {byt / 1e6:>8.1f} MB")
        if args.tensors:
            width = max(len(n) for n in file.tensors) if file.tensors else 0
            for info in file.tensors.values():
                tname = getattr(info.ggml_type, "name", str(info.ggml_type))
                shape = "x".join(str(d) for d in info.shape)
                print(f"    {info.name:<{width}}  {tname:<7} {shape}")
        return 0

    if args.command == "eval":
        # dataset scoring (vision_tpu/evaluate.py). Two modes:
        #   scoring-only:  eval --task mask -i <pred dir> --gt <gt dir>
        #   with a model:  eval -m model.gguf -i <images dir> --gt <gt dir>
        # The second runs bulk inference first (the -i directory through
        # the family's batching server) and scores the fresh predictions.
        import json as _json
        import tempfile

        from .evaluate import evaluate, format_report, task_for_family

        if not args.gt:
            parser.error("eval requires --gt <ground-truth dir (or JSON)>")
        try:
            if args.model:
                from .api import load_model, model_detect_family
                from .bulk import bulk_inputs, bulk_run, pair_masks
                from .core.gguf import model_load

                model_path = find_model(args.model)
                family = model_detect_family(model_load(model_path)).value
                task = args.task or task_for_family(family)
                if not os.path.isdir(args.input[0]):
                    raise VispError(
                        "eval with -m takes an image DIRECTORY as -i "
                        f"(got '{args.input[0]}')"
                    )
                inputs = bulk_inputs(args.input[0])
                if family == "migan":
                    if len(args.input) != 2 or not os.path.isdir(args.input[1]):
                        raise VispError(
                            "eval migan takes two directories: -i <images> <masks>"
                        )
                    inputs = pair_masks(inputs, args.input[1])
                elif len(args.input) != 1:
                    raise VispError("eval takes one input directory: -i <images>")
                dev = _device(args)
                with tempfile.TemporaryDirectory(prefix="vision-eval-") as tmp:
                    pred_dir = args.pred_out or tmp
                    with _Timer("Loading model weights"):
                        model = load_model(model_path, dev)
                    print(f"Predicting {len(inputs)} images"
                          + (f" -> {pred_dir}/" if args.pred_out else ""))
                    with _profile(args):
                        bulk_run(
                            model, inputs, pred_dir, prompt=args.prompt,
                            conf_thres=args.conf, iou_thres=args.iou,
                            batch_size=args.batch,
                        )
                    result = evaluate(
                        task, pred_dir, args.gt, align_depth=not args.no_align
                    )
            else:
                if not args.task:
                    parser.error("eval without -m requires --task")
                # pure host scoring — pin the CPU backend before any jnp
                # metric op (same tunnel contract as the compare verb)
                backend_init(BackendType.cpu)
                result = evaluate(
                    args.task, args.input[0], args.gt,
                    align_depth=not args.no_align,
                )
        except VispError as e:
            print(f"Error: {e}", file=sys.stderr)
            return 1
        print(format_report(result))
        if args.output:
            Path(args.output).write_text(_json.dumps(result, indent=1))
            print(f"-> {args.output}")
        return 0

    from .image import image_load, image_save

    # reference per-command default model files (cli.cpp:395-567,
    # inference_yolov9t.cpp:306) — resolved through the same search paths
    default_models = {
        "sam": "MobileSAM-F16.gguf",
        "birefnet": "BiRefNet-lite-F16.gguf",
        "depthany": "DepthAnythingV2-Small-F32.gguf",
        "migan": "MIGAN-512-places2-F16.gguf",
        "esrgan": "RealESRGAN-x4.gguf",
        "yolov9t": "yolov9t_converted-F16.gguf",
        "finetune": "RealESRGAN-x4.gguf",
    }

    try:
        # cheap validation FIRST: device init + weight load can take minutes
        # (remote compile / tunnel); a typo'd path must fail in milliseconds
        if not args.model and args.command not in default_models:
            raise VispError("No model specified (-m)")
        model_path = find_model(args.model or default_models[args.command])
        if args.adapter:
            # merge the LoRA adapter file into a temp deployable GGUF up
            # front; every downstream path (verbs, serve, bulk, video,
            # quantize, export) consumes the merged model transparently
            if not Path(args.adapter).is_file():
                raise VispError(f"Adapter file not found: {args.adapter}")
            from .api import merge_adapter

            model_path = merge_adapter(model_path, args.adapter)
        extra_paths = [model_path]
        if args.command == "serve":
            # resolve EVERY served model path here too — --extra-model
            # typos must fail before the (potentially minutes-long) device
            # init, same as -m
            if args.esrgan_model:  # back-compat alias for --extra-model
                extra_paths.append(find_model(args.esrgan_model))
            extra_paths += [find_model(m) for m in args.extra_model]
        # exact input arity per command (reference require_inputs,
        # cli.cpp:104-108): extra -i files are an error, not silently ignored
        required_inputs = {
            "sam": (1, "<image>"), "birefnet": (1, "<image>"),
            "depthany": (1, "<image>"), "esrgan": (1, "<image>"),
            "yolov9t": (1, "<image>"), "migan": (2, "<image> <mask>"),
        }
        if args.command in required_inputs:
            n_req, names = required_inputs[args.command]
            if len(args.input) != n_req:
                raise VispError(
                    f"Expected -i to be followed by {n_req} input(s): {names} "
                    f"- but found {len(args.input)}"
                )
        for inp in args.input or []:
            if not Path(inp).exists():
                raise VispError(f"Input file not found: {inp}")
        train_images = None
        student_path = None
        if args.command in ("finetune", "distill"):
            # expand dirs + validate BEFORE device init (fail fast)
            from .finetune import list_images

            train_images = list_images(args.input)
            if args.steps < 1 or (args.batch is not None and args.batch < 1):
                raise VispError(f"{args.command}: --steps and --batch must be >= 1")
            if args.command == "finetune" and args.masks is not None:
                # validate the mask pairing now: a missing/mismatched mask
                # dir must fail before the (minutes-long) device init
                from .bulk import pair_masks

                pair_masks(train_images, args.masks)
        if args.command == "distill":
            if not args.student:
                raise VispError("distill: --student <gguf> is required (-m is the teacher)")
            student_path = find_model(args.student)
        if args.command == "sam" and args.prompt and len(args.prompt) not in (2, 4):
            raise VispError(
                f"Expected 2 (point) or 4 (box) numbers for -p, got {len(args.prompt)}"
            )
        dev = _device(args)

        model_families = ("sam", "birefnet", "depthany", "migan", "esrgan", "yolov9t")
        from .video import is_video

        bulk_in = args.command in model_families and os.path.isdir(args.input[0])
        video_in = (
            args.command in model_families and not bulk_in and is_video(args.input[0])
        )
        if bulk_in or video_in:
            # bulk mode: a directory of images through the family's
            # batching server (vision_tpu/bulk.py) — one jitted program
            # per same-extent group, optionally dp-sharded over --dp chips.
            # video mode: the same servers over a frame stream
            # (vision_tpu/video.py), results re-encoded at the source fps
            mesh = None
            if args.dp:
                if args.dp < 1:
                    raise VispError(f"--dp must be >= 1, got {args.dp}")
                from .parallel import make_mesh

                mesh = make_mesh(args.dp)
            if args.command == "sam":
                from .models.mobile_sam import sam_load_model as loader
            elif args.command == "birefnet":
                from .models.birefnet import birefnet_load_model as loader
            elif args.command == "depthany":
                from .models.depth_anything import depthany_load_model as loader
            elif args.command == "migan":
                from .models.migan import migan_load_model as loader
            elif args.command == "esrgan":
                from .models.esrgan import esrgan_load_model as loader
            else:
                from .models.yolov9t import yolov9t_load_model as loader
            if video_in:
                import json

                from .video import video_run

                mask = None
                if args.command == "migan":
                    if len(args.input) != 2 or is_video(args.input[1]):
                        raise VispError(
                            "migan video mode takes -i <video> <mask-image> "
                            "(one static mask applied to every frame)"
                        )
                    mask = args.input[1]
                with _Timer("Loading model weights"):
                    model = loader(model_path, dev, mesh=mesh) if mesh else loader(model_path, dev)
                print(f"Processing {args.input[0]} -> {args.output}")
                with _profile(args):
                    dets = video_run(
                        model, args.input[0], args.output, prompt=args.prompt,
                        mask=mask, conf_thres=args.conf, iou_thres=args.iou,
                        batch_size=args.batch,
                    )
                if dets is not None:
                    dst = Path(args.output).with_suffix(".detections.json")
                    dst.write_text(json.dumps(dets, indent=1))
                    print(f"-> {dst} ({sum(len(d) for d in dets)} detections)")
                print(f"-> {args.output}")
                return 0
            from .bulk import bulk_inputs, bulk_run, pair_masks

            inputs = bulk_inputs(args.input[0])
            if args.command == "migan":
                if not os.path.isdir(args.input[1]):
                    raise VispError(
                        "migan bulk mode takes two directories: -i <images> <masks> "
                        "(masks matched to images by filename stem)"
                    )
                inputs = pair_masks(inputs, args.input[1])
            with _Timer("Loading model weights"):
                model = loader(model_path, dev, mesh=mesh) if mesh else loader(model_path, dev)
            print(f"Processing {len(inputs)} images -> {args.output}/")
            with _profile(args):
                outs = bulk_run(
                    model, inputs, args.output, prompt=args.prompt,
                    conf_thres=args.conf, iou_thres=args.iou,
                    batch_size=args.batch,
                )
            print(f"-> {len(outs)} files written to {args.output}/")
            return 0

        if args.command == "export":
            from .api import load_model
            from .export import export_model

            with _Timer("Loading model weights"):
                model = load_model(model_path, dev)
            dst = args.output or str(Path(model_path).with_suffix(".vxp"))
            with _Timer("Exporting programs"):
                names = export_model(
                    model, dst,
                    extent=tuple(args.extent) if args.extent else None,
                    batch=args.batch if args.batch is not None else 1,
                    embed_params=not args.no_embed,
                    platforms=tuple(args.platforms) if args.platforms else None,
                )
            print(f"-> {dst} ({Path(dst).stat().st_size / 1e6:.1f} MB; "
                  f"entries: {', '.join(names)})")
            return 0

        if args.command in ("finetune", "distill"):
            mesh = None
            if args.dp:
                if args.dp < 1:
                    raise VispError(f"--dp must be >= 1, got {args.dp}")
                from .parallel import make_mesh

                mesh = make_mesh(args.dp)
            batch = args.batch if args.batch is not None else 4
            if mesh is not None and batch % args.dp:
                raise VispError(f"--batch {batch} must be divisible by --dp {args.dp}")
            if args.command == "finetune":
                from .api import model_detect_family
                from .core.gguf import GGUFFile
                from .finetune import finetune

                family = model_detect_family(GGUFFile(model_path)).value
                kw = dict(
                    steps=args.steps, lr=args.lr, batch=batch,
                    trainable=args.train_filter, device=dev, mesh=mesh,
                    ckpt_dir=args.ckpt, ckpt_every=args.ckpt_every,
                    log=print,
                )
                if family == "birefnet":
                    kw.update(
                        masks=args.masks, size=args.size or 256,
                        augment=not args.no_augment, lora_rank=args.lora,
                        lora_out=args.lora_out, qlora=args.qlora,
                    )
                else:  # esrgan (the dispatcher rejects other families)
                    kw.update(patch=args.patch, ema_decay=args.ema)
                with _Timer("Fine-tuning"):
                    stats = finetune(model_path, train_images, args.output, **kw)
            else:
                from .finetune import distill_depthany

                with _Timer("Distilling"):
                    stats = distill_depthany(
                        model_path, student_path, train_images, args.output,
                        steps=args.steps, lr=args.lr, batch=batch,
                        size=args.size or 252, trainable=args.train_filter,
                        lora_rank=args.lora, lora_out=args.lora_out,
                        qlora=args.qlora, device=dev, mesh=mesh, ckpt_dir=args.ckpt,
                        ckpt_every=args.ckpt_every, log=print,
                    )
            if stats["first_loss"] is not None:
                print(
                    f"loss {stats['first_loss']:.5f} -> {stats['last_loss']:.5f} "
                    f"over {stats['steps']} steps ({len(train_images)} images)"
                )
            else:  # resumed at/past --steps: nothing left to train
                print(f"already trained to step {stats['steps']} (resumed); exported as-is")
            print(f"-> {stats['out']}")
            return 0

        if args.command == "serve":
            from .api import ModelFamily, model_detect_family
            from .serve_http import serve_forever

            def family_loader(fam):
                if fam == ModelFamily.sam:
                    from .models.mobile_sam import sam_load_model as _load

                    return "sam_model", _load
                if fam == ModelFamily.esrgan:
                    from .models.esrgan import esrgan_load_model as _load

                    return "esrgan_model", _load
                if fam == ModelFamily.birefnet:
                    from .models.birefnet import birefnet_load_model as _load

                    return "birefnet_model", _load
                if fam == ModelFamily.depth_anything:
                    from .models.depth_anything import depthany_load_model as _load

                    return "depthany_model", _load
                if fam == ModelFamily.migan:
                    from .models.migan import migan_load_model as _load

                    return "migan_model", _load
                if fam == ModelFamily.yolov9t:
                    from .models.yolov9t import yolov9t_load_model as _load

                    return "yolo_model", _load
                raise VispError(f"serve does not support {fam.value} models")

            mesh = None
            if args.dp:
                if args.dp < 1:
                    raise VispError(f"--dp must be >= 1, got {args.dp}")
                if args.batch is not None and args.batch % args.dp:
                    raise VispError(
                        f"--batch {args.batch} must be divisible by --dp {args.dp}"
                    )
                from .parallel import make_mesh

                mesh = make_mesh(args.dp)
            models = {}
            with _Timer("Loading model weights"):
                for path in extra_paths:
                    key, load = family_loader(model_detect_family(path))
                    if key in models:
                        raise VispError(f"two models of one family given ({key})")
                    # every family loader accepts mesh= and every server
                    # dp-shards its request batch (dryrun_multichip proves
                    # all 7 parities)
                    if mesh is not None:
                        models[key] = load(path, dev, mesh=mesh)
                    else:
                        models[key] = load(path, dev)
            serve_forever(batch_size=args.batch, host=args.host, port=args.port,
                          warmup=args.warmup, **models)

        elif args.command == "sam":
            from .models.mobile_sam import sam_load_model

            with _Timer("Loading model weights"):
                model = sam_load_model(model_path, dev)
            image = image_load(args.input[0])
            with _profile(args):
                with _Timer("Encoding image"):
                    model.encode(image)
                prompt = args.prompt or [image.width // 2, image.height // 2]
                with _Timer("Predicting mask"):
                    if len(prompt) >= 4:
                        mask = model.compute(box=((prompt[0], prompt[1]), (prompt[2], prompt[3])))
                    else:
                        mask = model.compute(point=(prompt[0], prompt[1]))
            image_save(mask, args.output)
            print(f"-> mask saved to {args.output}")
            if args.composite:
                _composite(image, mask, args.composite)

        elif args.command == "birefnet":
            from .models.birefnet import birefnet_load_model

            with _Timer("Loading model weights"):
                model = birefnet_load_model(model_path, dev)
            image = image_load(args.input[0])
            with _profile(args), _Timer("Running inference"):
                mask = model.compute(image)
            image_save(mask, args.output)
            print(f"-> mask saved to {args.output}")
            if args.composite:
                _composite(image, mask, args.composite)

        elif args.command == "depthany":
            from .image import ImageFormat, image_f32_to_u8
            from .models.depth_anything import depthany_load_model

            with _Timer("Loading model weights"):
                model = depthany_load_model(model_path, dev)
            image = image_load(args.input[0])
            with _profile(args), _Timer("Running inference"):
                depth = model.compute(image)
            image_save(image_f32_to_u8(depth, ImageFormat.alpha_u8), args.output)
            print(f"-> depth map saved to {args.output}")

        elif args.command == "migan":
            from .models.migan import migan_load_model

            with _Timer("Loading model weights"):
                model = migan_load_model(model_path, dev)
            image = image_load(args.input[0])
            mask = image_load(args.input[1])
            with _profile(args), _Timer("Running inference"):
                out = model.compute(image, mask)
            image_save(out, args.output)
            print(f"-> inpainted image saved to {args.output}")

        elif args.command == "esrgan":
            from .models.esrgan import esrgan_load_model

            with _Timer("Loading model weights"):
                model = esrgan_load_model(model_path, dev)
            image = image_load(args.input[0])
            # no --tile: let compute pick the backend-aware default (1024
            # whole-image path on TPU, reference 224 tiles on CPU)
            tile = args.tile if args.tile > 0 else None
            with _profile(args), _Timer("Running inference"):
                out = model.compute(image, tile_size=tile)
            image_save(out, args.output)
            print(f"-> upscaled image saved to {args.output}")

        elif args.command == "yolov9t":
            from .models.yolov9t import COCO_CLASS_NAMES, yolov9t_load_model

            with _Timer("Loading model weights"):
                model = yolov9t_load_model(model_path, dev)
            image = image_load(args.input[0])
            if args.dump:
                # eager forward under a capture context, per-layer .npy dump
                import numpy as _np

                from .core.params import Params
                from .models.yolov9t import letterbox as _letterbox, yolov9t_forward
                from .ops.debug import capture_context
                from .utils import dump_captures

                arr, _, _, _ = _letterbox(image, model.p.input_size)
                with capture_context() as caps:
                    yolov9t_forward(
                        Params(model.params), (arr[None].astype(_np.float32) / 255.0), model.p
                    )
                written = dump_captures(caps, args.dump)
                print(f"-> dumped {len(written)} feature maps to {args.dump}")
            with _profile(args), _Timer("Running inference"):
                dets = model.compute(image, args.conf, args.iou)
            print(f"Found {len(dets)} objects:")
            for d in dets:
                name = COCO_CLASS_NAMES[d.class_id] if d.class_id < len(COCO_CLASS_NAMES) else str(d.class_id)
                print(
                    f"  {name:>14s} {d.confidence:.2f} "
                    f"[{d.x1:.0f}, {d.y1:.0f}, {d.x2:.0f}, {d.y2:.0f}]"
                )
            from .models.yolov9t import draw_detections

            out = draw_detections(image, dets)
            image_save(out, args.output)
            print(f"-> annotated image saved to {args.output}")

        return 0
    except VispError as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())

from .profiling import Timer, trace
from .dump import dump_captures, compare_dumps
from .metrics import (
    average_precision,
    box_iou_matrix,
    depth_metrics,
    detection_map,
    mask_iou,
    mean_iou,
    psnr,
    ssim,
)

__all__ = [
    "Timer",
    "trace",
    "dump_captures",
    "compare_dumps",
    "average_precision",
    "box_iou_matrix",
    "depth_metrics",
    "detection_map",
    "mask_iou",
    "mean_iou",
    "psnr",
    "ssim",
]

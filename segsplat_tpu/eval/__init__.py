"""Evaluation metrics: mIoU/fwIoU (ScanNet++), IoU + Boundary-IoU (LERF-Masked),
PSNR/SSIM — the reference's metric definitions (README.md:101-103,
script/eval_lerf_mask_unified_lift.py:13-71, utils/image_utils.py:14-19)."""

from segsplat_tpu.eval.metrics import (boundary_iou, confusion_matrix, fw_iou,
                                       iou_per_class, mask_iou, mean_iou,
                                       miou_from_confusion, psnr_np)

__all__ = [
    "boundary_iou", "confusion_matrix", "fw_iou", "iou_per_class", "mask_iou",
    "mean_iou", "miou_from_confusion", "psnr_np",
]

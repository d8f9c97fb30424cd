from cobevt_tpu.metrics.iou import (
    IoUState,
    iou_update,
    iou_compute,
    confusion_counts,
    per_class_iou,
    mean_iou_reference,
)

from cobevt_tpu.metrics.iou import (
    IoUState,
    iou_update,
    iou_compute,
    confusion_counts,
    per_class_iou,
    mean_iou_reference,
)
from cobevt_tpu.metrics.detection_ap import (
    new_result_stat,
    accumulate_tp_fp,
    voc_ap,
    calculate_ap,
)

from cobevt_tpu.losses.seg_losses import (
    VanillaSegLoss,
    sigmoid_focal_loss,
    BinarySegmentationLoss,
    CenterLoss,
    MultipleLoss,
    weighted_cross_entropy,
)
from cobevt_tpu.losses.detection_loss import PointPillarLoss, smooth_l1

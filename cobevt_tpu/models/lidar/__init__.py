from cobevt_tpu.models.lidar.pillar_encoder import (
    PFNLayer,
    PillarVFE,
    pillar_scatter,
)
from cobevt_tpu.models.lidar.bev_backbone import (
    BaseBEVBackbone,
    AttBEVBackbone,
    AutoEncoder,
    DownsampleConv,
)
from cobevt_tpu.models.lidar.misc import mean_vfe, height_compression
from cobevt_tpu.models.lidar.point_pillar_models import (
    PointPillarFuseBEVT,
    PointPillarConfig,
)

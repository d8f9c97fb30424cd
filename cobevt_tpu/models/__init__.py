"""Model zoo: FAX/SinBEVT camera->BEV encoders, FuseBEVT fusion, CorpBEVT."""

from cobevt_tpu.models.corpbevt import CorpBEVT, CorpBEVTConfig, SinBEVT
from cobevt_tpu.models.camera_bev_models import (
    CameraBEVConfig,
    CameraBEVModel,
    MODEL_REGISTRY,
    create_model,
)
from cobevt_tpu.models.fax import FAXConfig, FAXModule
from cobevt_tpu.models.sinbevt_nuscenes import (
    CrossViewTransformer,
    PyramidAxialConfig,
    PyramidAxialEncoder,
)

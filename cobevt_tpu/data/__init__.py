from cobevt_tpu.data.labels import encode_binary_maps, decode_binary_maps
from cobevt_tpu.data.opv2v import (
    OPV2VScenarioDatabase,
    OPV2VCameraDataset,
    WildConfig,
    preprocess_camera_image,
    generate_bev_label,
    merge_static_labels,
)
from cobevt_tpu.data.loader import DataLoader

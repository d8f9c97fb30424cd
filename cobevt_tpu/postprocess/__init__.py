from cobevt_tpu.postprocess.voxel_postprocessor import (
    VoxelPostprocessor,
    generate_anchor_box,
    delta_to_boxes3d,
)

from cobevt_tpu.configs.presets import (
    corpbevt_default,
    corpbevt_static,
    sinbevt_opv2v,
)

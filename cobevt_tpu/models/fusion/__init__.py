"""Multi-agent BEV fusion modules (FuseBEVT and the baseline zoo)."""

from cobevt_tpu.models.fusion.swap_fusion import SwapFusionEncoder

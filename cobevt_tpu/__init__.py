"""cobevt_tpu — a TPU-native cooperative BEV perception framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CoBEVT
(DerrickXuNu/CoBEVT, CoRL 2022): SinBEVT single-agent camera->BEV
transformers with fused axial (FAX) attention, FuseBEVT multi-agent BEV
fusion, the cooperative CorpBEVT graph, plus the surrounding framework
(data frontends for OPV2V and nuScenes, losses, metrics, distributed
training over a `jax.sharding.Mesh`, checkpointing, benchmarking).

Design stance (differs from the reference on purpose):
  * one shared core instead of two forked pipelines
    (reference: `opv2v/` on OpenCOOD vs `nuscenes/` on CVT/Lightning);
  * channels-last (NHWC) layouts and static shapes everywhere so XLA can
    tile onto the MXU; variable agent counts are padded+masked, never
    dynamically split (reference splits by `record_len` at
    opv2v/opencood/models/sub_modules/fuse_utils.py:26);
  * data parallelism is a sharded `jit` over a device mesh with compiled
    collectives, not NCCL DDP (reference:
    opv2v/opencood/tools/multi_gpu_utils.py:16).
"""

__version__ = "0.1.0"

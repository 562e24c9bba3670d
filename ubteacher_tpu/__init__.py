"""ubteacher_tpu: a TPU-native (JAX/XLA/Pallas/pjit) semi-supervised object
detection framework with the capabilities of facebookresearch/unbiased-teacher-v2.

Design stance (vs the Detectron2/PyTorch reference at /root/reference):
  * pure-functional flax models, single jitted train step, fixed shapes
  * padded `(B, MAX_GT, ...)` instance tensors + validity masks replace
    detectron2 `Instances` (reference: detectron2.structures.Instances)
  * teacher EMA, pseudo-label NMS/thresholding and target assignment run
    in-graph on device (reference: host-side python loops,
    ubteacher/engine/trainer.py:181-429)
  * data parallel via jax.sharding GSPMD over a device mesh (reference:
    one-process-per-GPU NCCL DDP, train_net.py:66-73)
"""

__version__ = "0.1.0"

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

import os as _os

import jax as _jax

# persistent compilation cache: train-step compiles are expensive (minutes
# through the axon tunnel); cache them across processes
try:
    _cache_dir = _os.environ.get(
        "UBT_JAX_CACHE_DIR", _os.path.expanduser("~/.cache/ubteacher_jax")
    )
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

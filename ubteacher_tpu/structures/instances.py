"""Fixed-shape instance containers.

The reference carries per-image ground truth / predictions in dynamic-length
`detectron2.structures.Instances` lists. On TPU everything must be static
shape, so instances live in padded `(..., M, ...)` arrays with a boolean
validity mask. All downstream ops (target assignment, NMS, losses) are
masked rather than gathered.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class PaddedInstances:
    """Ground-truth or pseudo-label boxes for a batch of images.

    Shapes: boxes (B, M, 4) xyxy in canvas pixels; classes (B, M) int32 in
    [0, num_classes); scores (B, M); box_std (B, M, 4) the teacher's raw
    per-boundary uncertainty logits (reference `reg_pred_std`,
    fcos_outputs.py:798-801); mask (B, M) bool validity.
    """

    boxes: jnp.ndarray
    classes: jnp.ndarray
    scores: jnp.ndarray
    box_std: jnp.ndarray
    mask: jnp.ndarray

    @staticmethod
    def empty(batch: int, max_boxes: int) -> "PaddedInstances":
        return PaddedInstances(
            boxes=jnp.zeros((batch, max_boxes, 4), jnp.float32),
            classes=jnp.zeros((batch, max_boxes), jnp.int32),
            scores=jnp.zeros((batch, max_boxes), jnp.float32),
            box_std=jnp.zeros((batch, max_boxes, 4), jnp.float32),
            mask=jnp.zeros((batch, max_boxes), bool),
        )

    @property
    def num_valid(self) -> jnp.ndarray:
        return self.mask.sum(axis=-1)


@flax.struct.dataclass
class Detections:
    """Padded post-NMS detections for a batch of images.

    boxes (B, K, 4) xyxy in canvas pixels; scores (B, K) the NMS-criterion
    score; classes (B, K); cls_confid (B, K) raw class sigmoid (reference
    `cls_confid`); centerness (B, K); box_std (B, K, 4); mask (B, K).
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    cls_confid: jnp.ndarray
    centerness: jnp.ndarray
    box_std: jnp.ndarray
    mask: jnp.ndarray


# jax.export serialization: both containers flatten with empty () auxdata,
# so the artifact only needs a stable name (tools/export_inference.py
# serves the inference fns whose outputs are these pytrees)
try:
    from jax import export as _jax_export

    for _cls in (PaddedInstances, Detections):
        _jax_export.register_pytree_node_serialization(
            _cls,
            serialized_name=f"ubteacher_tpu.{_cls.__name__}",
            serialize_auxdata=lambda aux: b"",
            deserialize_auxdata=lambda b: (),
        )
    del _cls
except Exception:  # pragma: no cover — jax without export serialization
    pass

"""Helpers shared by the FCOS and RCNN step builders."""

from __future__ import annotations

import jax.numpy as jnp


def image_hw(images: jnp.ndarray) -> jnp.ndarray:
    """(B, 2) float32 of the full canvas size."""
    b = images.shape[0]
    h, w = images.shape[1:3]
    return jnp.broadcast_to(jnp.asarray([h, w], jnp.float32)[None, :], (b, 2))


def hw_or_canvas(batch, key: str, images: jnp.ndarray) -> jnp.ndarray:
    """(B, 2) float32 true per-image sizes; full canvas when the batch
    ships none (synthetic benches / direct step calls)."""
    hw = batch.get(key)
    if hw is None:
        return image_hw(images)
    return jnp.asarray(hw, jnp.float32)


def float_images(batch: dict) -> dict:
    """Cast the batch's image tensors to float32 at step entry.

    The loader ships raw uint8 pixels (4x less host->device transfer);
    casting FIRST thing inside the jitted step keeps the rest of the
    program byte-identical to the battle-tested float32 one — running
    strong_augment/stem directly on integer inputs produced a distinct
    program that faulted the TPU worker at the first mutual step
    (kernel-fault family, ROUND5_NOTES r5; reproduced 2x)."""
    out = dict(batch)
    for k in ("images_label_k", "images_unlabel_k"):
        v = out.get(k)
        if v is not None and not jnp.issubdtype(v.dtype, jnp.floating):
            out[k] = v.astype(jnp.float32)
    return out

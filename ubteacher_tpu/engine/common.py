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

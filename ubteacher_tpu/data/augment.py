"""Augmentations.

Weak geometric augmentation (resize-shortest-edge jitter + horizontal flip)
runs on host in numpy/cv2 — it changes geometry, so it must transform boxes
(reference: DatasetMapperTwoCropSeparate weak path, data/dataset_mapper.py:92-139).

Strong photometric augmentation runs ON DEVICE inside the jitted train step:
SimCLR-style color jitter -> random grayscale -> Gaussian blur -> 3x random
erasing (reference: build_strong_augmentation, data/detection_utils.py:8-46).
Geometry is untouched, so the weak image's boxes stay valid — which is what
lets the whole strong branch fuse into the train step with zero host work.

Known deviations from torchvision (documented, cosmetic):
  * ColorJitter sub-ops apply in fixed order (brightness, contrast,
    saturation, hue) instead of a random permutation;
  * RandomErasing samples one candidate rectangle instead of 10 tries.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# host-side weak augmentation
# --------------------------------------------------------------------------


def resize_shortest_edge_params(
    h: int,
    w: int,
    min_size,
    max_size: int,
    sampling: str,
    rng: np.random.Generator,
) -> Tuple[int, int]:
    """Target (new_h, new_w) per D2 ResizeShortestEdge semantics."""
    if sampling == "range":
        size = int(rng.integers(min_size[0], min_size[1] + 1))
    else:  # choice
        size = int(min_size[int(rng.integers(len(min_size)))])
    scale = size / min(h, w)
    if h < w:
        new_h, new_w = size, int(round(scale * w))
    else:
        new_h, new_w = int(round(scale * h)), size
    if max(new_h, new_w) > max_size:
        scale2 = max_size / max(new_h, new_w)
        new_h = int(round(new_h * scale2))
        new_w = int(round(new_w * scale2))
    return new_h, new_w


def random_crop_params(
    h: int, w: int, crop_type: str, crop_size, rng: np.random.Generator
) -> Tuple[int, int, int, int]:
    """(y0, x0, crop_h, crop_w) per D2 RandomCrop.get_crop_size semantics
    (reference inserts T.RandomCrop before resize when INPUT.CROP.ENABLED,
    dataset_mapper.py:38-44)."""
    if crop_type == "relative":
        ch, cw = crop_size
        crop_h, crop_w = int(h * ch + 0.5), int(w * cw + 0.5)
    elif crop_type == "relative_range":
        sz = np.asarray(crop_size, np.float32)
        ch, cw = sz + rng.random(2).astype(np.float32) * (1.0 - sz)
        crop_h, crop_w = int(h * ch + 0.5), int(w * cw + 0.5)
    elif crop_type == "absolute":
        crop_h, crop_w = min(int(crop_size[0]), h), min(int(crop_size[1]), w)
    elif crop_type == "absolute_range":
        assert crop_size[0] <= crop_size[1]
        crop_h = int(rng.integers(min(h, int(crop_size[0])), min(h, int(crop_size[1])) + 1))
        crop_w = int(rng.integers(min(w, int(crop_size[0])), min(w, int(crop_size[1])) + 1))
    else:
        raise NotImplementedError(f"Unknown crop type {crop_type}")
    y0 = int(rng.integers(h - crop_h + 1))
    x0 = int(rng.integers(w - crop_w + 1))
    return y0, x0, crop_h, crop_w


def weak_augment_geometry(
    h: int,
    w: int,
    boxes: np.ndarray,  # (M, 4) xyxy
    canvas_hw,  # (h, w) or list of (h, w) candidates (scale buckets)
    min_size,
    max_size: int,
    sampling: str,
    rng: np.random.Generator,
    flip: bool = True,
    crop=None,  # (crop_type, crop_size) to enable INPUT.CROP
) -> Dict:
    """The rng draws + box math of `apply_weak_augment`, WITHOUT pixels.

    Every random draw the weak augmentation makes depends only on the image
    dimensions (crop window, resize jitter, flip coin) — never on pixel
    content. Splitting the geometry out lets multi-host loaders replay the
    same draw sequence from COCO metadata (width/height) on every process
    while only the row's owner decodes the JPEG (parallel/mesh.py
    shard_batch ships just the owned rows).

    Returns a geometry record consumed by `materialize_weak_augment`:
    crop window, resized (new_h, new_w), chosen canvas, flip flag,
    transformed boxes, keep mask, true hw.
    """
    keep = np.ones((len(boxes),), bool)
    crop_win = None
    if crop is not None:
        y0, x0, crop_h, crop_w = random_crop_params(h, w, crop[0], crop[1], rng)
        crop_win = (y0, x0, crop_h, crop_w)
        h, w = crop_h, crop_w
        if len(boxes):
            boxes = boxes.astype(np.float32).copy()
            boxes[:, [0, 2]] = (boxes[:, [0, 2]] - x0).clip(0, crop_w)
            boxes[:, [1, 3]] = (boxes[:, [1, 3]] - y0).clip(0, crop_h)
            keep = (boxes[:, 2] - boxes[:, 0] > 1e-5) & (
                boxes[:, 3] - boxes[:, 1] > 1e-5
            )
    new_h, new_w = resize_shortest_edge_params(h, w, min_size, max_size, sampling, rng)
    if isinstance(canvas_hw[0], (tuple, list)):
        candidates = sorted(canvas_hw, key=lambda c: c[0] * c[1])
        canvas_hw = candidates[-1]
        for c in candidates:
            if new_h <= c[0] and new_w <= c[1]:
                canvas_hw = tuple(c)
                break
    # additionally fit into the fixed canvas (TPU fixed-shape policy)
    ch, cw = canvas_hw
    if new_h > ch or new_w > cw:
        s = min(ch / new_h, cw / new_w)
        new_h, new_w = int(new_h * s), int(new_w * s)
    sx, sy = new_w / w, new_h / h
    out_boxes = boxes.astype(np.float32).copy()
    if len(out_boxes):
        out_boxes[:, [0, 2]] *= sx
        out_boxes[:, [1, 3]] *= sy

    do_flip = flip and rng.random() < 0.5
    if do_flip and len(out_boxes):
        x1 = new_w - out_boxes[:, 2]
        x2 = new_w - out_boxes[:, 0]
        out_boxes[:, 0], out_boxes[:, 2] = x1, x2

    return {
        "crop": crop_win,
        "new_hw": (new_h, new_w),
        "boxes": out_boxes,
        "hw": np.asarray([new_h, new_w], np.float32),
        "canvas": (ch, cw),
        "keep": keep,
        "flip": do_flip,
    }


def materialize_weak_augment(image: np.ndarray, geom: Dict) -> np.ndarray:
    """Apply a `weak_augment_geometry` record to pixels: crop, resize,
    flip, pad to the chosen canvas. Returns the (ch, cw, 3) image —
    uint8 when the decoded source is uint8 (the standard disk path; 4x
    less host->device transfer than f32 and bit-identical pixel values,
    the models normalize in f32 regardless), float32 otherwise."""
    import cv2

    if geom["crop"] is not None:
        y0, x0, crop_h, crop_w = geom["crop"]
        image = image[y0 : y0 + crop_h, x0 : x0 + crop_w]
    new_h, new_w = geom["new_hw"]
    resized = cv2.resize(image, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    if geom["flip"]:
        resized = resized[:, ::-1]
    ch, cw = geom["canvas"]
    dtype = np.uint8 if resized.dtype == np.uint8 else np.float32
    canvas = np.zeros((ch, cw, 3), dtype)
    canvas[:new_h, :new_w] = resized.astype(dtype)
    return canvas


def apply_weak_augment(
    image: np.ndarray,  # (H, W, 3) uint8, BGR
    boxes: np.ndarray,  # (M, 4) xyxy
    canvas_hw,  # (h, w) or list of (h, w) candidates (scale buckets)
    min_size,
    max_size: int,
    sampling: str,
    rng: np.random.Generator,
    flip: bool = True,
    crop=None,  # (crop_type, crop_size) to enable INPUT.CROP
) -> Dict[str, np.ndarray]:
    """Resize jitter + hflip + fit-to-canvas + pad. Returns the padded float32
    image, transformed boxes, the true (h, w) inside the canvas, and the
    chosen canvas.

    `canvas_hw` may be a list of candidate canvases (scale buckets): the
    smallest (by area) that fits the jittered size is chosen, so the full
    MIN_SIZE_TRAIN jitter range survives on fixed shapes (one XLA program
    per bucket) instead of being clipped to a single canvas; only images
    exceeding every bucket are downscaled to the largest.

    `crop=(type, size)` applies D2 RandomCrop BEFORE the resize (reference:
    dataset_mapper.py:38-44); boxes are shifted and clipped to the crop,
    and the returned `keep` marks boxes that survive with positive extent
    (D2 filter_empty_instances).
    """
    geom = weak_augment_geometry(
        image.shape[0], image.shape[1], boxes, canvas_hw, min_size, max_size,
        sampling, rng, flip=flip, crop=crop,
    )
    return {
        "image": materialize_weak_augment(image, geom),
        "boxes": geom["boxes"],
        "hw": geom["hw"],
        "canvas": geom["canvas"],
        "keep": geom["keep"],
    }


# --------------------------------------------------------------------------
# on-device strong augmentation (jit-able, geometry-preserving)
# --------------------------------------------------------------------------


def _rgb_weights_for_bgr() -> jnp.ndarray:
    # luma weights in BGR channel order
    return jnp.asarray([0.114, 0.587, 0.2989], jnp.float32)


def _to_hsv(x):
    """x in [0,1], BGR channel order -> (h, s, v)."""
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe_d = jnp.where(d == 0, 1.0, d)
    hr = jnp.mod((g - b) / safe_d, 6.0)
    hg = (b - r) / safe_d + 2.0
    hb = (r - g) / safe_d + 4.0
    hue = jnp.where(mx == r, hr, jnp.where(mx == g, hg, hb)) / 6.0
    hue = jnp.where(d == 0, 0.0, hue)
    sat = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return hue, sat, mx


def _from_hsv(hue, sat, val):
    """-> BGR in [0,1]."""
    h6 = hue * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = val * (1 - sat)
    q = val * (1 - f * sat)
    t = val * (1 - (1 - f) * sat)
    i = jnp.mod(i, 6.0)
    r = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [val, q, p, p, t, val],
    )
    g = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [t, val, val, q, p, p],
    )
    b = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [p, p, t, val, val, q],
    )
    return jnp.stack([b, g, r], axis=-1)


def _color_jitter(x, key, brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1):
    """x (H, W, 3) in [0, 1] BGR; all math in x.dtype."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    luma = _rgb_weights_for_bgr().astype(x.dtype)

    def u(k, lo, hi):
        return jax.random.uniform(k, (), minval=lo, maxval=hi).astype(x.dtype)

    fb = u(kb, 1 - brightness, 1 + brightness)
    x = x * fb
    gray = (x * luma).sum(-1, keepdims=True)
    fc = u(kc, 1 - contrast, 1 + contrast)
    x = x * fc + gray.mean() * (1 - fc)
    fs = u(ks, 1 - saturation, 1 + saturation)
    x = x * fs + gray * (1 - fs)
    x = jnp.clip(x, 0.0, 1.0)
    fh = u(kh, -hue, hue)
    hch, s, v = _to_hsv(x)
    x = _from_hsv(jnp.mod(hch + fh, 1.0), s, v)
    return jnp.clip(x, 0.0, 1.0)


def _grayscale(x):
    luma = _rgb_weights_for_bgr()
    g = (x * luma).sum(-1, keepdims=True)
    return jnp.broadcast_to(g, x.shape)


def _blur_band_matrix(n: int, k: jnp.ndarray, half: int) -> jnp.ndarray:
    """(n, n) matrix M with M[i, j] = sum of tap weights k[t] over all t
    with clip(i + t, 0, n-1) == j — i.e. an edge-padded 1-D convolution as
    a banded matmul. Built with `taps` scatter-adds (trace-time loop)."""
    i = jnp.arange(n)
    m = jnp.zeros((n, n), k.dtype)
    for t in range(-half, half + 1):
        j = jnp.clip(i + t, 0, n - 1)
        m = m.at[i, j].add(k[t + half])
    return m


def _gaussian_blur(x, sigma, taps: int = 9):
    """Separable Gaussian blur with per-image sigma (PIL radius=sigma).

    Implemented as two banded matmuls (one per axis) instead of 3-channel
    depthwise convolutions: a 3-feature conv uses 3/128 MXU lanes and XLA
    pads/relayouts around it (~12 ms/step profiled on v5e at batch 12),
    while the (W, W)/(H, H) band matrices ride the MXU at full tilt. Cost
    is 2*H*W*(H+W)*C MACs/image (~13 GFLOP at the 768x1344 canvas) — far
    more FLOPs than the ~0.1 GFLOP depthwise conv, but measurably faster
    on v5e because they are dense MXU matmuls instead of lane-starved
    convs. Edge clamping is folded into the band matrices, so
    this equals the edge-padded conv exactly.
    """
    half = taps // 2
    d = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-(d**2) / (2.0 * jnp.maximum(sigma, 1e-3) ** 2))
    k = (k / k.sum()).astype(x.dtype)

    h, w = x.shape[0], x.shape[1]
    # out[i] = sum_j M[i, j] x[j]: contract M's second index (M is only
    # symmetric away from the clamped edges). The matmuls run in bf16
    # with f32 accumulation: values are in [0, 1] and the weights sum to
    # 1, so the bf16 rounding of the operands (~4e-3 absolute) is below
    # the 1/255 quantization the reference's uint8 PIL blur applies to
    # every sample — and it halves the measured matmul time (f32 einsums
    # profiled 5.9 ms/step at 768x1344 batch 8).
    dt = x.dtype
    xb = x.astype(jnp.bfloat16)
    mw = _blur_band_matrix(w, k, half).astype(jnp.bfloat16)  # (W, W)
    xb = jnp.einsum(
        "hwc,vw->hvc", xb, mw, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    mh = _blur_band_matrix(h, k, half).astype(jnp.bfloat16)  # (H, H)
    x = jnp.einsum(
        "hwc,uh->uwc", xb, mh, preferred_element_type=jnp.float32
    )
    return x.astype(dt)


def _random_erase(x, key, p, scale, ratio):
    """One-candidate RandomErasing with normal-noise fill, x in [0,1]."""
    h, w = x.shape[0], x.shape[1]
    karea, kratio, ky, kx, kval, kp = jax.random.split(key, 6)
    area = h * w
    target = jax.random.uniform(karea, (), minval=scale[0], maxval=scale[1]) * area
    logr = jax.random.uniform(
        kratio, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    r = jnp.exp(logr)
    eh = jnp.sqrt(target * r)
    ew = jnp.sqrt(target / r)
    eh = jnp.clip(eh, 1, h - 1).astype(jnp.int32)
    ew = jnp.clip(ew, 1, w - 1).astype(jnp.int32)
    y0 = jax.random.randint(ky, (), 0, h - eh)
    x0 = jax.random.randint(kx, (), 0, w - ew)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inside = (yy >= y0) & (yy < y0 + eh) & (xx >= x0) & (xx < x0 + ew)
    noise = jnp.clip(jax.random.normal(kval, x.shape, x.dtype), 0.0, 1.0)
    apply = jax.random.uniform(kp, ()) < p
    return jnp.where(apply & inside[..., None], noise, x)


def strong_augment_single(image: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
    """Full strong pipeline for one (H, W, 3) BGR image in [0, 255].

    Computed in bfloat16 (this is augmentation noise — precision is
    irrelevant and the pipeline is pure HBM bandwidth); returned in the
    input dtype.
    """
    orig_dtype = image.dtype
    x = image.astype(jnp.bfloat16) / 255.0
    k = jax.random.split(key, 6)
    # ColorJitter with p=0.8
    jittered = _color_jitter(x, k[0])
    x = jnp.where(jax.random.uniform(k[1], ()) < 0.8, jittered, x)
    # RandomGrayscale p=0.2
    x = jnp.where(jax.random.uniform(k[2], ()) < 0.2, _grayscale(x), x)
    # GaussianBlur p=0.5, sigma ~ U[0.1, 2]
    sigma = jax.random.uniform(k[3], (), minval=0.1, maxval=2.0)
    x = jnp.where(jax.random.uniform(k[4], ()) < 0.5, _gaussian_blur(x, sigma), x)
    # 3x RandomErasing (reference: detection_utils.py:29-43)
    ke = jax.random.split(k[5], 3)
    x = _random_erase(x, ke[0], 0.7, (0.05, 0.2), (0.3, 3.3))
    x = _random_erase(x, ke[1], 0.5, (0.02, 0.2), (0.1, 6.0))
    x = _random_erase(x, ke[2], 0.3, (0.02, 0.2), (0.05, 8.0))
    x = x * 255.0
    if not jnp.issubdtype(orig_dtype, jnp.floating):
        # uint8 inputs (the loader's raw-pixel batches): round + clamp
        # before the integer cast — jitter/blur can leave values a hair
        # outside [0, 255] and a bare cast would wrap. The uint8
        # quantization itself matches the reference, whose strong
        # pipeline runs on uint8 PIL images (detection_utils.py:8-46).
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    return x.astype(orig_dtype)


def strong_augment(images: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
    """Batched on-device strong augmentation; (B, H, W, 3) in [0, 255]."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(strong_augment_single)(images, keys)

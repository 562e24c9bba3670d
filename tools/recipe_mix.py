"""Recipe-mix throughput: jitter-weighted effective img/s (VERDICT r4 #3).

The shipped coco-standard recipes jitter the shortest edge over
(400, 1200) "range" (reference: configs/FCOS/coco-standard/*.yaml INPUT —
the (800,) block earlier in the file is shadowed, last-key-wins), and the
TPU loader buckets each draw onto the smallest canvas that fits
(768x1344 base or the 1024x1344 extra; data/loader.py + augment.py
weak_augment_geometry). BENCH_r0N measures only the base canvas; the
number the recipe actually trains at is the BUCKET-PROBABILITY-WEIGHTED
mix of per-canvas step times.

This tool computes the bucket probabilities by replaying the loader's
OWN geometry code over the COCO train2017 size distribution (the real
annotation file when present, else the bench_loader marginal-dims
approximation), then combines them with measured per-canvas ms/step
(from tools/profile_step.py --canvas runs) into the effective img/s.

Usage:
    python tools/recipe_mix.py                         # probabilities only
    python tools/recipe_mix.py --ms 768 1344 290.0 --ms 1024 1344 380.0
        # + weighted effective img/s (16 img/step at 8+8)
"""

from __future__ import annotations

import argparse
import collections
import json
import sys

import numpy as np


def coco_dims(n: int, rng) -> list:
    """(h, w) samples: real val2017/train2017 sizes if available, else the
    bench_loader COCO-marginal approximation."""
    import os

    root = os.environ.get("COCO_ROOT", "datasets/coco")
    for name in ("instances_train2017.json", "instances_val2017.json"):
        p = os.path.join(root, "annotations", name)
        if os.path.isfile(p):
            with open(p) as f:
                images = json.load(f)["images"]
            idx = rng.integers(0, len(images), n)
            return [(images[i]["height"], images[i]["width"]) for i in idx]
    from tools.bench_loader import COCO_LIKE_DIMS

    idx = rng.integers(0, len(COCO_LIKE_DIMS), n)
    return [COCO_LIKE_DIMS[i] for i in idx]


def bucket_probs(n: int = 20000, seed: int = 0) -> dict:
    """Replay weak_augment_geometry's canvas choice over the size dist."""
    from ubteacher_tpu.config import add_ubteacher_config, get_cfg
    from ubteacher_tpu.data.augment import weak_augment_geometry

    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(
        "configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml"
    )
    cfg.freeze()
    canvases = {
        "landscape": [tuple(cfg.TPU.CANVAS_LANDSCAPE)],
        "portrait": [tuple(cfg.TPU.CANVAS_PORTRAIT)],
    }
    for c in cfg.TPU.EXTRA_TRAIN_CANVASES:
        h, w = int(c[0]), int(c[1])
        canvases["landscape" if w >= h else "portrait"].append((h, w))

    rng = np.random.default_rng(seed)
    counts = collections.Counter()
    for h, w in coco_dims(n, rng):
        orient = "landscape" if w >= h else "portrait"
        g = weak_augment_geometry(
            h, w, np.zeros((0, 4), np.float32), canvases[orient],
            cfg.INPUT.MIN_SIZE_TRAIN, cfg.INPUT.MAX_SIZE_TRAIN,
            cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING, rng,
        )
        # orientation is a transpose of the same program shape: fold it
        ch, cw = g["canvas"]
        counts[(min(ch, cw), max(ch, cw))] += 1
    return {f"{a}x{b}": c / n for (a, b), c in sorted(counts.items())}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument(
        "--ms", nargs=3, action="append", default=[],
        metavar=("H", "W", "MS"),
        help="measured ms/step for canvas HxW (repeatable)",
    )
    ap.add_argument("--imgs-per-step", type=float, default=16.0)
    args = ap.parse_args()

    probs = bucket_probs(args.n)
    out = {"bucket_probs": {k: round(v, 4) for k, v in probs.items()}}
    if args.ms:
        ms = {}
        for h, w, v in args.ms:
            a, b = sorted((int(h), int(w)))
            ms[f"{a}x{b}"] = float(v)
        missing = [k for k in probs if k not in ms]
        if missing:
            out["missing_ms_for"] = missing
        else:
            eff_ms = sum(probs[k] * ms[k] for k in probs)
            out["per_canvas_ms"] = ms
            out["effective_ms_per_step"] = round(eff_ms, 1)
            out["effective_img_s_chip"] = round(
                args.imgs_per_step / eff_ms * 1000.0, 1
            )
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()

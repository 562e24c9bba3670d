"""On-device A/B of TPU.STEM_MODE (conv vs pallas) for both families.

Runs all four (family, stem_mode) mutual-step configurations in ONE
process (the axon tunnel serializes TPU processes and never caches
compiles — batching all compiles into one process is mandatory,
CLAUDE.md), captures several profiler trace windows per configuration
around the same compiled step, and reports the MINIMUM total device
ms/step plus the stem-attributed buckets (the pooled chip has up to 20x
run-to-run contention variance; min-of-device-time is the honest
comparator).

Decision rule (VERDICT round-3 weak #1 / next #2): flip the
TPU.STEM_MODE default to "pallas" if it wins on BOTH families, else
record the measured dead-end.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_stem.py \
        [--repeats 3] [--steps 3] [--modes conv pallas]
"""

from __future__ import annotations

import argparse
import json
import sys


def run_one(family: str, mode: str, repeats: int, steps: int):
    from tools.profile_step import aggregate, capture

    rcnn = family == "rcnn"
    out = f"/tmp/ubt_ab_stem_{family}_{mode}"
    args = argparse.Namespace(
        rcnn=rcnn,
        # match the batch sizes of the recorded round-3 profiles for
        # comparability (ROUND3_NOTES.md: FCOS @8+8, RCNN @4+4)
        batch=4 if rcnn else 8,
        canvas=(768, 1344),
        steps=steps,
        out=out,
        config=(
            "configs/Faster-RCNN/coco-standard/"
            "faster_rcnn_R_50_FPN_ut2_sup1_run0.yaml"
            if rcnn
            else "configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml"
        ),
        opts=["TPU.STEM_MODE", mode],
        repeats=repeats,
    )
    capture(args)
    runs = []
    for k in range(repeats):
        total, by_cat, by_group = aggregate(f"{out}/r{k}", steps)
        stem_ms = sum(
            ms for name, ms in by_group.items()
            if "stem" in name or "pallas_stem" in name
        )
        runs.append({"total_ms": total, "stem_ms": stem_ms})
    best = min(runs, key=lambda r: r["total_ms"])
    return {
        "family": family,
        "mode": mode,
        "total_ms_min": round(best["total_ms"], 2),
        "stem_ms_at_min": round(best["stem_ms"], 2),
        "all_totals": [round(r["total_ms"], 2) for r in runs],
        "all_stem": [round(r["stem_ms"], 2) for r in runs],
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--modes", nargs="*", default=["conv", "pallas"])
    ap.add_argument("--families", nargs="*", default=["fcos", "rcnn"])
    args = ap.parse_args()

    results = []
    for family in args.families:
        for mode in args.modes:
            r = run_one(family, mode, args.repeats, args.steps)
            print(json.dumps(r), flush=True)
            results.append(r)
    print(json.dumps({"ab_stem": results}))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()

"""Profile one mutual-learning train step and print a device-time breakdown.

Captures a jax.profiler trace (XLA device events) around a few steps of the
FCOS or RCNN mutual step on the current backend, then aggregates device op
time by HLO category and by model component (tf_op attribution).

Usage:
    python tools/profile_step.py [--rcnn] [--batch 8] [--canvas 768 1344]
                                 [--steps 3] [--out /tmp/ubt_xprof]

The reference has no profiler integration (SURVEY.md §5); its only signal
is wall-clock IterationTimer. This is the TPU-native equivalent: the same
trace also opens in XProf/TensorBoard (`--out` keeps the .xplane.pb).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys


def capture(args) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ubteacher_tpu.config import add_ubteacher_config, get_cfg
    from ubteacher_tpu.solver import build_optimizer
    from ubteacher_tpu.structures import PaddedInstances

    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(args.config)
    cfg.SEMISUPNET.BURN_UP_STEP = 0
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    if args.rcnn:
        from ubteacher_tpu.engine.rcnn_trainer import (
            RCNNTrainState as State, make_rcnn_train_steps as make_steps,
        )
        from ubteacher_tpu.modeling.rcnn import build_two_stage_rcnn as build
    else:
        from ubteacher_tpu.engine.fcos_trainer import (
            FCOSTrainState as State, make_fcos_train_steps as make_steps,
        )
        from ubteacher_tpu.modeling.fcos_head import (
            build_one_stage_detector as build,
        )

    model = build(cfg)
    b = args.batch
    h, w = args.canvas
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, h, w, 3)))[
        "params"
    ]
    tx = build_optimizer(cfg, params)
    state = State.create(params, tx)
    _, mutual_step = make_steps(cfg, model, tx)

    m = cfg.TPU.MAX_GT
    boxes = np.zeros((b, m, 4), np.float32)
    mask = np.zeros((b, m), bool)
    nb = 12
    boxes[:, :nb, 0] = rng.uniform(0, w - 200, (b, nb))
    boxes[:, :nb, 1] = rng.uniform(0, h - 200, (b, nb))
    boxes[:, :nb, 2] = boxes[:, :nb, 0] + rng.uniform(20, 200, (b, nb))
    boxes[:, :nb, 3] = boxes[:, :nb, 1] + rng.uniform(20, 200, (b, nb))
    mask[:, :nb] = True
    gt = PaddedInstances(
        jnp.asarray(boxes),
        jnp.zeros((b, m), jnp.int32),
        jnp.ones((b, m), jnp.float32),
        jnp.zeros((b, m, 4), jnp.float32),
        jnp.asarray(mask),
    )
    imgs = jnp.asarray(
        rng.normal(110, 45, (b, h, w, 3)).clip(0, 255).astype(np.float32)
    )
    batch = {
        "images_label_k": imgs,
        "gt_label": gt,
        "images_unlabel_k": imgs,
        "rng": jax.random.PRNGKey(2),
    }
    s, met = mutual_step(state, batch)
    jax.device_get(met["total_loss"])  # compile + honest sync
    # repeats > 1 captures several independent trace windows around the
    # SAME compiled step (subdirs r0, r1, ...) so callers can take the
    # minimum device time — the pooled chip has large run-to-run
    # contention variance (CLAUDE.md).
    repeats = getattr(args, "repeats", 1)
    for k in range(repeats):
        out = args.out if repeats == 1 else f"{args.out}/r{k}"
        with jax.profiler.trace(out):
            for _ in range(args.steps):
                s, met = mutual_step(s, batch)
            jax.device_get(met["total_loss"])
    return args.out


def aggregate(trace_dir: str, steps: int):
    """Parse the newest trace under trace_dir into per-step device-time
    aggregates: (total_ms, by_cat Counter[ms], by_group Counter[ms])."""
    run = sorted(glob.glob(trace_dir + "/plugins/profile/*/"))[-1]
    path = glob.glob(run + "*.trace.json.gz")[0]
    with gzip.open(path) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
    by_cat = collections.Counter()
    by_group = collections.Counter()
    total = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pnames.get(e.get("pid"), ""):
            continue
        n = e["name"]
        if n.startswith("jit_") or n.isdigit():
            continue
        d = e.get("dur", 0)
        total += d
        by_cat[re.match(r"([a-zA-Z\-_]+)", n).group(1).rstrip(".")] += d
        op = e.get("args", {}).get("tf_op", "")
        grp = re.sub(r"jit\(\w+\)/", "", op)
        grp = re.sub(r"[0-9]+", "#", grp)[:90]
        if grp:
            by_group[grp] += d
    denom = steps * 1000.0
    return (
        total / denom,
        collections.Counter({k: v / denom for k, v in by_cat.items()}),
        collections.Counter({k: v / denom for k, v in by_group.items()}),
    )


def report(trace_dir: str, steps: int, repeats: int = 1) -> None:
    if repeats > 1:
        # min-of-runs: the pooled chip has up to 20x contention variance
        # (CLAUDE.md) — report the quietest window's full breakdown.
        runs = [aggregate(f"{trace_dir}/r{k}", steps) for k in range(repeats)]
        total_ms, by_cat, by_group = min(runs, key=lambda r: r[0])
        print(f"all totals: {[round(r[0], 1) for r in runs]} ms/step (min shown)")
    else:
        total_ms, by_cat, by_group = aggregate(trace_dir, steps)
    print(f"total device time: {total_ms:.1f} ms/step")
    print("--- by HLO category ---")
    for n, d in by_cat.most_common(15):
        print(f"{d:8.2f} ms  {n}")
    print("--- by model component (tf_op) ---")
    for n, d in by_group.most_common(30):
        print(f"{d:8.2f} ms  {n}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rcnn", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--canvas", type=int, nargs=2, default=(768, 1344))
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/ubt_xprof")
    ap.add_argument(
        "--config",
        default="configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml",
    )
    ap.add_argument(
        "--opts", nargs="*", default=[],
        help="config KEY VALUE overrides, train_net.py style",
    )
    ap.add_argument(
        "--report-only",
        action="store_true",
        help="parse an existing trace dir instead of capturing",
    )
    ap.add_argument(
        "--repeats", type=int, default=1,
        help="capture N independent trace windows and report the minimum",
    )
    args = ap.parse_args()
    # only swap the UNTOUCHED default config for --rcnn; never override an
    # explicitly supplied one
    if args.rcnn and args.config == ap.get_default("config"):
        args.config = (
            "configs/Faster-RCNN/coco-standard/"
            "faster_rcnn_R_50_FPN_ut2_sup1_run0.yaml"
        )
    if not args.report_only:
        capture(args)
    report(args.out, args.steps, args.repeats)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()

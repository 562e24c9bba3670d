"""Long-run soak: ~5k production-canvas steps on device + kill/resume.

VERDICT r4 next #5 — the cheapest available proxy for the reference's
180k-iter regime (reference configs SOLVER.MAX_ITER). Drives the REAL
host trainer (two-stream disk loader with pooled cv2 decode, EventStorage,
periodic orbax checkpoints, periodic eval) on synthetic COCO-size JPEGs at
the shipped FCOS recipe geometry, and checks:

  * step-time drift (per-iteration `time` metric in metrics.json; compile
    steps show up as the per-canvas-bucket first-step outliers — their sum
    is the COLD-START COMPILE BUDGET, VERDICT r4 next #3),
  * host RSS growth (daemon sampler -> soak_rss.jsonl),
  * eval + checkpoint hooks firing at period,
  * kill -9 at a mid-run checkpoint, then resume: the restored state must
    hash bitwise-identical to the state recorded at save time in the
    killed process, and training must continue to MAX_ITER.

Usage (parent orchestrates; owns the TPU for the whole run):
    python tools/soak.py [--max-iter 5000] [--kill-at 3000]
                         [--burnin 300] [--workdir /tmp/ubt_soak]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import signal
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def state_hash(state) -> str:
    """Order-stable sha256 over every leaf's raw bytes (+ dtype/shape)."""
    import jax

    h = hashlib.sha256()
    leaves, _ = jax.tree.flatten(jax.device_get(state))
    for leaf in leaves:
        a = np.asarray(leaf)
        h.update(str((a.dtype.str, a.shape)).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def build_cfg(args, outdir: str):
    from ubteacher_tpu.config import add_ubteacher_config, get_cfg

    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(
        "configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml"
    )
    cfg.MODEL.FCOS.NUM_CLASSES = 1  # synthetic single-class jpegs
    cfg.SOLVER.IMG_PER_BATCH_LABEL = 8
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = 8
    cfg.SOLVER.MAX_ITER = args.max_iter
    cfg.SOLVER.CHECKPOINT_PERIOD = args.checkpoint_period
    cfg.SOLVER.BASE_LR = 0.002  # from-scratch backbone at short horizon
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 10.0
    cfg.SEMISUPNET.BURN_UP_STEP = args.burnin
    cfg.TEST.EVAL_PERIOD = args.eval_period
    # Single scale bucket for the soak (r5, measured): the first
    # mutual-phase compile with the extra 1024 bucket in the mix died
    # with "INTERNAL: TPU backend error" at iter 301 (after a clean
    # 300-iter burn-in) — the mixed-canvas pair program faults the
    # worker, same runtime-fault family as the 256px eval note in
    # CLAUDE.md. Base-canvas programs are the bench-proven path; the
    # 1024 bucket's compile/step costs are measured separately by the
    # profile session (ROUND5_NOTES). Soak scope: drift, RSS, hook
    # cadence, kill/resume — not the multi-bucket program matrix.
    cfg.TPU.EXTRA_TRAIN_CANVASES = []
    # Diagnostic (r5): the real-loader mutual program (per-image hw
    # masking) at production canvas kernel-faults the worker at its
    # FIRST step with the pallas stem (reproduced across f32 and uint8
    # input variants; bench/profile mutual programs — no hw inputs —
    # run fine). conv stem isolates whether the stem is the common
    # factor of the whole-program fault family; costs ~7 ms/step.
    cfg.TPU.STEM_MODE = "conv"
    cfg.TPU.DATA_THREADS = 4
    cfg.MODEL.WEIGHTS = ""
    cfg.SEED = 0
    cfg.OUTPUT_DIR = outdir
    cfg.freeze()
    return cfg


def ensure_dataset(workdir: Path, n: int = 200):
    """Landscape-only COCO-size jpegs. Rationale (measured, r5): every
    (label-bucket, unlabel-bucket) canvas pair is a distinct jitted
    signature; with both orientations and the two scale buckets that is
    up to 16 programs per phase, and with the compilation cache dead
    over the axon tunnel the client retains several GB of host memory
    PER COMPILE — the full-orientation soak grew 20 -> 87 GB RSS by
    iter 300 (identical slope with eager batch release, so the growth
    is compile-driven) and would OOM the 125 GB host before the first
    kill-checkpoint. Landscape-only halves the program count while
    keeping the multi-scale-bucket compile budget that item #3 is
    measuring. Orientation coverage itself is exercised by the test
    suite and the eval path."""
    from tools.bench_loader import COCO_LIKE_DIMS, write_synthetic_jpegs

    json_path = workdir / "instances.json"
    if not json_path.exists():
        write_synthetic_jpegs(
            workdir, n, dims=[(h, w) for h, w in COCO_LIKE_DIMS if w >= h]
        )
    return str(json_path), str(workdir / "images")


def run_child(args) -> None:
    """The training process (killed by the parent at --kill-at)."""
    from ubteacher_tpu.data.coco import load_coco_json
    from ubteacher_tpu.engine.trainer import UBTeacherTrainer

    workdir = Path(args.workdir)
    outdir = str(workdir / "out")
    json_path, img_dir = ensure_dataset(workdir)
    dicts, meta = load_coco_json(json_path, img_dir)
    datasets = {
        "train": dicts[:100], "train_unlabel": dicts[100:184],
        "test": dicts[184:], "meta": meta,
    }
    cfg = build_cfg(args, outdir)
    trainer = UBTeacherTrainer(cfg, datasets=datasets)
    trainer.resume_or_load(resume=True)

    # record a bitwise state hash at every checkpoint save, so the resume
    # process can prove the restored state equals what the killed process
    # saved (orbax round-trip across process death)
    hashes_path = Path(outdir) / "state_hashes.json"
    hashes = (
        json.loads(hashes_path.read_text()) if hashes_path.exists() else {}
    )
    orig_save = trainer.checkpointer.save

    def hashing_save(step, state):
        orig_save(step, state)
        hashes[str(step)] = state_hash(state)
        hashes_path.write_text(json.dumps(hashes))

    trainer.checkpointer.save = hashing_save

    # RSS curve sampler (daemon): iteration + resident set every 15 s
    rss_path = Path(outdir) / "soak_rss.jsonl"

    def sampler():
        t0 = time.time()
        with open(rss_path, "a") as f:
            while True:
                rec = {
                    "t": round(time.time() - t0, 1),
                    "rss_mb": round(_rss_mb(), 1),
                    "iter": int(getattr(trainer.storage, "iter", -1)),
                }
                f.write(json.dumps(rec) + "\n")
                f.flush()
                time.sleep(15)

    threading.Thread(target=sampler, daemon=True).start()
    trainer.train()


def _finalized_checkpoint_steps(outdir: Path):
    ckdir = outdir / "checkpoints"
    if not ckdir.exists():
        return []
    steps = []
    for d in ckdir.iterdir():
        if d.is_dir() and d.name.isdigit() and not list(
            d.glob("*.orbax-checkpoint-tmp*")
        ):
            steps.append(int(d.name))
    return sorted(steps)


def analyze(outdir: Path, resumed_at: int, hash_ok: bool,
            killed_at_wall: float) -> dict:
    """Summarize metrics.json + soak_rss.jsonl into the soak record."""
    times, iters_with_eval, total_losses = [], [], []
    mpath = outdir / "metrics.json"
    for line in mpath.read_text().splitlines():
        rec = json.loads(line)
        if "time" in rec:
            times.append((rec.get("iteration", len(times)), rec["time"]))
        if any(k.startswith("teacher/") for k in rec):
            iters_with_eval.append(rec.get("iteration"))
        if "total_loss" in rec:
            total_losses.append(rec["total_loss"])
    # metrics.json lines are 20-step WINDOW MEANS (EventStorage
    # log_period): a window containing a compile (first execution of a
    # (phase, canvas-bucket) program) shows as a >5x-median outlier whose
    # excess over the median, times the window size, approximates the
    # compile seconds. Sum of excesses = the cold-start compile budget.
    vals = sorted(t for _, t in times)
    med = vals[len(vals) // 2] if vals else 0.0
    thresh = max(5 * med, 5)
    compile_steps = [(i, round(t, 1)) for i, t in times if t > thresh]
    compile_budget = sum(20.0 * (t - med) for _, t in times if t > thresh)
    steady = [t for _, t in times if t <= thresh]
    first = steady[: max(1, len(steady) // 5)]
    last = steady[-max(1, len(steady) // 5):]
    rss = [
        json.loads(line)
        for line in (outdir / "soak_rss.jsonl").read_text().splitlines()
    ]
    return {
        "soak": "fcos_production_canvas",
        "metric_windows": len(times),
        "steps_covered": 20 * len(times),
        "median_step_ms": round(med * 1000, 1),
        "steady_first_fifth_ms": round(float(np.mean(first)) * 1000, 1),
        "steady_last_fifth_ms": round(float(np.mean(last)) * 1000, 1),
        "compile_outliers": compile_steps,
        "compile_budget_s": round(compile_budget, 1),
        "rss_start_mb": rss[0]["rss_mb"] if rss else None,
        "rss_end_mb": rss[-1]["rss_mb"] if rss else None,
        "rss_max_mb": max((r["rss_mb"] for r in rss), default=None),
        "eval_iters": iters_with_eval,
        "checkpoints": _finalized_checkpoint_steps(outdir),
        "killed_after_s": round(killed_at_wall, 1),
        "resumed_at": resumed_at,
        "resume_hash_bitwise_equal": hash_ok,
        "final_losses_finite": bool(
            np.isfinite(total_losses[-50:]).all() if total_losses else False
        ),
    }


def run_parent(args) -> None:
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    outdir = workdir / "out"
    ensure_dataset(workdir)  # numpy/cv2 only: no jax in the parent yet

    child_cmd = [sys.executable, __file__, "--child"] + sys.argv[1:]
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:" + str(Path.cwd())
    t0 = time.time()
    killed = False
    # the pooled tunnel occasionally drops a compile RPC mid-flight
    # ("remote_compile: response body closed"); the child resumes from
    # the latest checkpoint, so relaunching is the production-realistic
    # recovery (restart + --resume, SURVEY.md §5) — allow a few
    for attempt in range(4):
        child = subprocess.Popen(child_cmd, env=env)
        # poll for a finalized checkpoint at >= kill-at, then kill -9
        while child.poll() is None:
            steps = _finalized_checkpoint_steps(outdir)
            if steps and steps[-1] >= args.kill_at:
                time.sleep(10)  # let the async orbax write fully settle
                print(f"# killing child at checkpoint {steps[-1]} "
                      f"(+{time.time()-t0:.0f}s)", file=sys.stderr)
                child.send_signal(signal.SIGKILL)
                child.wait()
                killed = True
                break
            time.sleep(10)
        if killed:
            break
        print(f"# child exited rc={child.returncode} before the kill "
              f"checkpoint (attempt {attempt + 1}); relaunching",
              file=sys.stderr)
        time.sleep(30)  # let the tunnel/worker settle
    killed_at_wall = time.time() - t0
    if not killed:
        raise RuntimeError(
            f"child kept exiting (last rc={child.returncode}) before "
            f"reaching a checkpoint >= {args.kill_at}"
        )
    ck_step = _finalized_checkpoint_steps(outdir)[-1]

    # resume IN THIS process (the TPU is free now): restored state must
    # match the killed process's recorded hash bitwise, then train to end
    from ubteacher_tpu.data.coco import load_coco_json
    from ubteacher_tpu.engine.trainer import UBTeacherTrainer

    json_path, img_dir = ensure_dataset(workdir)
    dicts, meta = load_coco_json(json_path, img_dir)
    datasets = {
        "train": dicts[:100], "train_unlabel": dicts[100:184],
        "test": dicts[184:], "meta": meta,
    }
    cfg = build_cfg(args, str(outdir))
    trainer = UBTeacherTrainer(cfg, datasets=datasets)
    trainer.resume_or_load(resume=True)
    resumed_at = trainer.start_iter
    recorded = json.loads((outdir / "state_hashes.json").read_text())
    hash_ok = state_hash(trainer.state) == recorded.get(str(resumed_at))
    print(f"# resumed at {resumed_at} (ck {ck_step}), "
          f"bitwise hash equal: {hash_ok}", file=sys.stderr)
    trainer.train()

    summary = analyze(outdir, resumed_at, hash_ok, killed_at_wall)
    (workdir / "soak_summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max-iter", type=int, default=5000)
    ap.add_argument("--kill-at", type=int, default=3000)
    ap.add_argument("--burnin", type=int, default=300)
    ap.add_argument("--checkpoint-period", type=int, default=1000)
    ap.add_argument("--eval-period", type=int, default=2000)
    ap.add_argument("--workdir", default="/tmp/ubt_soak")
    ap.add_argument("--child", action="store_true",
                    help="internal: the training process")
    args = ap.parse_args()
    if args.child:
        run_child(args)
    else:
        run_parent(args)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()

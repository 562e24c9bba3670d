#!/usr/bin/env python
"""Training CLI — same surface as the reference's train_net.py
(reference: /root/reference/train_net.py:15-73):

    python train_net.py --config configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml \
        [--eval-only] [--resume] [--num-gpus N] KEY VALUE ...

`--num-gpus/--num-machines/--machine-rank/--dist-url` are accepted for CLI
compatibility; distribution is a single-process GSPMD mesh over all visible
TPU chips (multi-host via jax.distributed.initialize when
UBT_MULTIHOST=1), so the flags only bound the mesh size.
"""

from __future__ import annotations

import argparse
import os
import sys


def default_argument_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="ubteacher_tpu training")
    parser.add_argument("--config-file", "--config", default="", metavar="FILE")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--num-gpus", type=int, default=-1,
                        help="bounds the data-parallel mesh size")
    parser.add_argument("--num-machines", type=int, default=1)
    parser.add_argument("--machine-rank", type=int, default=0)
    parser.add_argument("--dist-url", default="auto")
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="'KEY VALUE' config overrides")
    return parser


def setup(args):
    from ubteacher_tpu.config import add_ubteacher_config, get_cfg

    cfg = get_cfg()
    add_ubteacher_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.num_gpus > 0:
        cfg.TPU.MESH_DATA = args.num_gpus
    cfg.freeze()
    return cfg


def main(args) -> None:
    if os.environ.get("UBT_MULTIHOST") == "1":
        import jax

        # On TPU pods / SLURM the no-arg form auto-detects the cluster;
        # UBT_COORDINATOR/UBT_NUM_PROCESSES/UBT_PROCESS_ID override for
        # manual launches (and the 2-process CPU test).
        kwargs = {}
        if os.environ.get("UBT_COORDINATOR"):
            kwargs = dict(
                coordinator_address=os.environ["UBT_COORDINATOR"],
                num_processes=int(os.environ["UBT_NUM_PROCESSES"]),
                process_id=int(os.environ["UBT_PROCESS_ID"]),
            )
        from ubteacher_tpu.parallel.mesh import distributed_init

        # initialize + warmup collective: establishes the backend's
        # collective context while processes are handshake-synced
        # (see distributed_init docstring)
        distributed_init(**kwargs)

    cfg = setup(args)
    trainer_name = cfg.SEMISUPNET.Trainer
    if trainer_name == "ubteacher":
        from ubteacher_tpu.engine.trainer import UBTeacherTrainer as Trainer
    elif trainer_name == "ubteacher_rcnn":
        from ubteacher_tpu.engine.trainer import (
            UBRCNNTeacherTrainer as Trainer,
        )
    else:
        raise ValueError(f"Trainer Name is not found: {trainer_name}")

    trainer = Trainer(cfg)
    if args.eval_only:
        trainer.resume_or_load(resume=args.resume)
        results = trainer.test(model="teacher")
        print(results)
        return
    trainer.resume_or_load(resume=args.resume)
    trainer.train()


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    main(args)

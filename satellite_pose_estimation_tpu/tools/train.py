"""R2-style config-driven train CLI (R2/tools/train.py:16-68 surface):

    python -m satellite_pose_estimation_tpu.tools.train \
        -c configs/speed/rtdetr_r50vd_kl.yml [-r ckpt | -t ckpt] [--test-only]
"""
from __future__ import annotations

import argparse

from ..core.yaml_config import YAMLConfig
from ..train.solver import TASKS


def main(args):
    assert not (args.tuning and args.resume), \
        "Only support from_scrach or resume or tuning at one time"
    cfg = YAMLConfig(args.config)
    solver_cls = TASKS[cfg.task]
    solver = solver_cls(cfg, data_root=args.data_root, seed=args.seed)
    if args.resume:
        solver.resume(args.resume)
    if args.tuning:
        solver.tuning(args.tuning)
    if args.test_only:
        ret = solver.val()
        # landmarker val() returns (scalar_summary, evaluator); detection
        # returns the COCO stat dict
        stats = ret[0] if isinstance(ret, tuple) else ret
        print(stats)
    else:
        solver.fit()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", "-c", type=str, required=True)
    parser.add_argument("--resume", "-r", type=str, default=None)
    parser.add_argument("--tuning", "-t", type=str, default=None)
    parser.add_argument("--test-only", action="store_true", default=False)
    parser.add_argument("--data_root", default="./data/speed")
    parser.add_argument("--seed", type=int, default=42)
    main(parser.parse_args())

#!/usr/bin/env python
"""Ensemble evaluation entry point (the reference's run_eval.py, TPU-native).

Example (Bag-of-POPCORN, 5 members):
  POPCORN_DATA=/data python run_eval.py -occmodel -senbuilds -S2 -NIR -S1 \
      -treg rwa --fourseasons -r m1 m2 m3 m4 m5
"""

import time

from popcorn_tpu.cli.args import (
    eval_config_from_args,
    eval_parser,
    model_config_from_args,
)
from popcorn_tpu.config import DataPaths
from popcorn_tpu.dist.mesh import make_mesh
from popcorn_tpu.infer.evaluator import Evaluator


def main():
    args = eval_parser().parse_args()
    from popcorn_tpu.utils import apply_platform_env, enable_compile_cache

    apply_platform_env()
    cache = enable_compile_cache(args.compile_cache)
    if cache:
        print("XLA compile cache:", cache)
    paths = DataPaths(args.data_root)
    mcfg = model_config_from_args(args)
    ecfg = eval_config_from_args(args)

    if args.multihost:
        import jax

        from popcorn_tpu.dist.mesh import make_multihost_mesh

        jax.distributed.initialize()
        mesh = make_multihost_mesh(
            args.data_parallel if args.data_parallel > 1 else None,
            n_ensemble=args.ensemble_parallel,
        )
    else:
        mesh = (
            make_mesh(args.data_parallel, n_ensemble=args.ensemble_parallel)
            if args.data_parallel > 1 or args.ensemble_parallel > 1
            else None
        )
    ev = Evaluator(paths, mcfg, ecfg, mesh=mesh, use_wandb=args.wandb)
    print("Experiment folder:", ev.experiment_folder)

    since = time.time()
    stats = ev.test_target(save=True, full=args.full)
    for k, v in sorted(stats.items()):
        print(f"  {k}: {v:.4f}")
    elapsed = time.time() - since
    print(f"Evaluating completed in {elapsed // 60:.0f}m {elapsed % 60:.0f}s")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Training entry point (the reference's run_train.py:479-488, TPU-native).

Example (Rwanda, occupancy model, on-the-fly Sentinel buildings):
  POPCORN_DATA=/data python run_train.py -S2 -NIR -S1 -treg rwa \
      -tregtrain rwa -occmodel -senbuilds -pret -binit 0.9407
"""

import time

from popcorn_tpu.cli.args import (
    model_config_from_args,
    train_config_from_args,
    train_parser,
)
from popcorn_tpu.config import DataPaths
from popcorn_tpu.train.trainer import Trainer


def main():
    args = train_parser().parse_args()
    from popcorn_tpu.utils import apply_platform_env, enable_compile_cache

    apply_platform_env()
    cache = enable_compile_cache(args.compile_cache)
    if cache:
        print("XLA compile cache:", cache)
    if args.multihost:
        # must run before the first jax backend query on every host
        import jax

        jax.distributed.initialize()
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    paths = DataPaths(args.data_root)
    mcfg = model_config_from_args(args)
    tcfg = train_config_from_args(args)

    trainer = Trainer(paths, mcfg, tcfg, resume=args.resume, use_wandb=args.wandb)
    print("Experiment folder:", trainer.experiment_folder)

    since = time.time()
    trainer.train()
    elapsed = time.time() - since
    print(f"Training completed in {elapsed // 60:.0f}m {elapsed % 60:.0f}s")


if __name__ == "__main__":
    main()

"""Console-script entry points (pip-installed popcorn-train / popcorn-eval)."""

from __future__ import annotations

import time


def train_main():
    from ..config import DataPaths
    from ..train.trainer import Trainer
    from .args import model_config_from_args, train_config_from_args, train_parser

    args = train_parser().parse_args()
    if args.multihost:
        # must run before the first jax backend query on every host
        import jax

        jax.distributed.initialize()
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    trainer = Trainer(
        DataPaths(args.data_root),
        model_config_from_args(args),
        train_config_from_args(args),
        resume=args.resume,
        use_wandb=args.wandb,
    )
    print("Experiment folder:", trainer.experiment_folder)
    since = time.time()
    trainer.train()
    elapsed = time.time() - since
    print(f"Training completed in {elapsed // 60:.0f}m {elapsed % 60:.0f}s")


def eval_main():
    from ..config import DataPaths
    from ..dist.mesh import make_mesh
    from ..infer.evaluator import Evaluator
    from .args import eval_config_from_args, eval_parser, model_config_from_args

    args = eval_parser().parse_args()
    if getattr(args, "multihost", False):
        import jax

        from ..dist.mesh import make_multihost_mesh

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
    ev = Evaluator(
        DataPaths(args.data_root),
        model_config_from_args(args),
        eval_config_from_args(args),
        mesh=mesh,
        use_wandb=args.wandb,
    )
    print("Experiment folder:", ev.experiment_folder)
    since = time.time()
    stats = ev.test_target(save=True, full=args.full)
    for k, v in sorted(stats.items()):
        print(f"  {k}: {v:.4f}")
    elapsed = time.time() - since
    print(f"Evaluating completed in {elapsed // 60:.0f}m {elapsed % 60:.0f}s")

"""popcorn-tpu: TPU-native population mapping from Sentinel-1/2 imagery.

A from-scratch JAX/XLA/Pallas rebuild of the POPCORN pipeline
(prs-eth/Popcorn) — see README.md and COMPONENTS.md.

Light top-level surface (heavy deps import lazily in submodules):

    from popcorn_tpu import DataPaths, ModelConfig, TrainConfig, EvalConfig
    from popcorn_tpu.train.trainer import Trainer
    from popcorn_tpu.infer.evaluator import Evaluator
"""

from .config import DataPaths, EvalConfig, ModelConfig, TrainConfig

__version__ = "0.1.0"

__all__ = ["DataPaths", "EvalConfig", "ModelConfig", "TrainConfig", "__version__"]

#!/usr/bin/env python
"""Export a popcorn-tpu orbax checkpoint to the reference's torch .pth
format, so models trained on TPU can be evaluated by the original
prs-eth/Popcorn implementation (reverse interop of run_eval.py -r *.pth).

  python tools/export_torch_checkpoint.py <orbax_ckpt_dir> <out.pth> \
      [--biasinit 0.75]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="orbax checkpoint dir (last_model/best_model)")
    p.add_argument("out", help="output .pth path")
    p.add_argument("--biasinit", type=float, default=0.75)
    a = p.parse_args()

    import jax

    # a host-side tool: the conversion needs no accelerator, and restoring
    # through a remote-TPU backend round-trips every array
    jax.config.update("jax_platforms", "cpu")

    from popcorn_tpu.compat.torch_convert import (
        load_popcorn_from_dda,
        save_popcorn_checkpoint,
    )
    from popcorn_tpu.config import ModelConfig
    from popcorn_tpu.train import checkpoint as ckpt
    from popcorn_tpu.train.state import make_optimizer
    from popcorn_tpu.config import TrainConfig

    mcfg = ModelConfig(pretrained=True, biasinit=a.biasinit)
    params0, consts = load_popcorn_from_dda(mcfg)
    optimizer = make_optimizer(TrainConfig())
    template = {
        "params": params0,
        "opt_state": optimizer.init(params0),
        "epoch": 0,
        "iter": 0,
    }
    state = ckpt.restore_checkpoint(a.checkpoint, template)
    save_popcorn_checkpoint(
        a.out, state["params"], consts,
        epoch=int(state["epoch"]), iteration=int(state["iter"]),
    )
    print("->", a.out)


if __name__ == "__main__":
    main()

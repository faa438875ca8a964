#!/usr/bin/env python
"""Train the DDA built-up extractor with fusion-DA consistency training.

The TPU-native path to (re)produce the frozen dual-stream UNet that
POPCORN uses as feature/building extractor (the released checkpoint
fusionda_newAug8_16_checkpoint30_lossweight0.5.pt came from this scheme).

Example:
  python tools/run_dda_train.py --manifest data/manifest.json \
      --epochs 30 --loss SoftDiceLoss --consistency-factor 0.5
"""
import argparse, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", required=True)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--loss", default="SoftDiceLoss")
    p.add_argument("--consistency-factor", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--labeled-per-batch", type=int, default=8)
    p.add_argument("--unlabeled-per-batch", type=int, default=8)
    p.add_argument("--out", default="dda_checkpoint")
    p.add_argument(
        "--no-augment", action="store_true",
        help="disable the training augmentations (flip/rot90/color/gamma, "
        "reference DDA_model/utils/augmentations.py:11-31)",
    )
    p.add_argument("--crop-size", type=int, default=0,
                   help="random-crop size during training (0 = off)")
    p.add_argument(
        "--test", action="store_true",
        help="after training, run the per-site test loop (pixel P/R/F1/IoU "
        "+ morphology metrics per head; reference evaluation.py:252-453)",
    )
    p.add_argument(
        "--test-manifest", default=None,
        help="manifest of held-out test sites for --test (the SpaceNet7 "
        "analogue); defaults to the training manifest",
    )
    args = p.parse_args()

    from popcorn_tpu.utils import apply_platform_env

    apply_platform_env()

    from popcorn_tpu.dda.train import DDAConfig, DDATrainer
    from popcorn_tpu.train.checkpoint import save_checkpoint

    aug_on = not args.no_augment
    cfg = DDAConfig(
        epochs=args.epochs, loss_type=args.loss,
        loss_factor=args.consistency_factor, lr=args.lr,
        labeled_per_batch=args.labeled_per_batch,
        unlabeled_per_batch=args.unlabeled_per_batch,
        random_flip=aug_on, random_rotate=aug_on,
        color_shift=aug_on, gamma_correction=aug_on,
        crop_size=args.crop_size,
    )
    tr = DDATrainer(args.manifest, cfg)
    for e in range(cfg.epochs):
        loss = tr.train_epoch(augment=aug_on)
        print(f"epoch {e}: loss {loss:.4f}")
    print("eval:", tr.evaluate())
    if args.test:
        from popcorn_tpu.dda.train import format_site_report

        print(format_site_report(tr.test_per_site(args.test_manifest)))
    params, bn = tr.export_for_popcorn()
    save_checkpoint(os.path.abspath(args.out), {"unet": params, "unet_bn": bn})
    print("saved", args.out)


if __name__ == "__main__":
    main()

"""CLI argument surface mirroring the reference's configargparse parsers
(arguments/train.py:8-61 and arguments/eval.py:3-27) so a reference user
can reuse their command lines, plus the data-root flag that replaces the
hard-coded cluster paths. Config files are supported via @file syntax
(argparse fromfile, covering eval's `-c config` use case)."""

from __future__ import annotations

import argparse

from ..config import EvalConfig, ModelConfig, TrainConfig


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--data_root", type=str, default=None,
                   help="PopMapData root (default: $POPCORN_DATA)")
    p.add_argument("-treg", "--target_regions", nargs="+", default=["rwa"])
    p.add_argument("-S1", "--Sentinel1", action="store_true")
    p.add_argument("-S2", "--Sentinel2", action="store_true")
    p.add_argument("-NIR", "--NIR", action="store_true")
    p.add_argument("-VIIRS", "--VIIRS", action="store_true",
                   help="read+normalize VIIRS nightlights as an extra input "
                        "channel (the reference resolves the file but never "
                        "exposes a flag)")
    p.add_argument("-m", "--model", type=str, default="POPCORN")
    p.add_argument("-occmodel", "--occupancymodel", action="store_true")
    p.add_argument("-binp", "--buildinginput", action="store_true")
    p.add_argument("-sinp", "--segmentationinput", action="store_true")
    p.add_argument("-senbuilds", "--sentinelbuildings", action="store_true")
    p.add_argument("-fe", "--feature_extractor", type=str, default="DDA")
    p.add_argument("-pret", "--pretrained", action="store_true")
    p.add_argument("-binit", "--biasinit", type=float, default=0.75)
    p.add_argument("-tlevel", "--train_level", nargs="+", default=["coarse"])
    p.add_argument("-wp", "--wandb_project", type=str, default="POPCORN")
    p.add_argument("--wandb", action="store_true", help="mirror metrics to wandb")
    # TPU-specific
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--fused_head", action="store_true", default=None)
    p.add_argument("--no_fused_head", dest="fused_head", action="store_false")
    p.add_argument("--remat", dest="remat_unet", action="store_true",
                   help="jax.checkpoint each UNet DoubleConv: ~the UNet's "
                        "activation HBM traded for one extra forward pass. "
                        "Raises the trainable-pixel ceiling past the "
                        "reference's freeze tiers (-lim1/-lim2: it freezes "
                        "the encoder/UNet above those sizes for GPU memory, "
                        "run_train.py:190-198 — with --remat the full model "
                        "can keep training at those sizes instead)")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="devices on the 'data' mesh axis")
    p.add_argument("--ensemble_parallel", type=int, default=1,
                   help="devices on the 'ensemble' mesh axis: Bag-of-POPCORN "
                        "members evaluate concurrently on a 2-D "
                        "('data','ensemble') mesh (eval only)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host pod: jax.distributed.initialize() + a "
                        "DCN x ICI hybrid mesh (data-parallel across hosts, "
                        "data/ensemble within each ICI slice)")
    p.add_argument("--compile_cache", nargs="?", const="~/.cache/popcorn_tpu/xla",
                   default=None, metavar="DIR",
                   help="persistent XLA compilation cache: skip the ~20-40 s "
                        "re-jit on every invocation (bare flag uses "
                        "~/.cache/popcorn_tpu/xla; also $POPCORN_COMPILE_CACHE)")
    p.add_argument("--debug_nans", action="store_true",
                   help="jax.debug_nans: raise at the op that produced a NaN "
                        "(the reference's torch.autograd.set_detect_anomaly)")


def train_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native POPCORN training", fromfile_prefix_chars="@"
    )
    _add_common(p)
    p.add_argument("-r", "--resume", type=str, default=None)
    p.add_argument("-tregtrain", "--target_regions_train", nargs="+", default=["rwa"])
    p.add_argument("-wb", "--weak_batch_size", type=int, default=2)
    p.add_argument("--spatial_train", action="store_true",
                   help="with --data_parallel N: shard each sample's rows "
                        "over the mesh instead of the batch — census-region "
                        "crops beyond one chip's HBM train across the mesh "
                        "(XLA halo exchange) instead of being tier-skipped; "
                        "raise -lim1/-lim2/-lim3 accordingly")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer update: the jitted step "
                        "scans N microbatches of batch/N samples and applies "
                        "one averaged update — same effective batch, ~N x "
                        "less activation HBM (combine with --remat for the "
                        "largest crops)")
    p.add_argument("-wvb", "--weak_val_batch_size", type=int, default=1)
    p.add_argument("-e", "--num_epochs", type=int, default=100)
    p.add_argument("-lr", "--learning_rate", type=float, default=1e-4)
    p.add_argument("-l", "--loss", nargs="+", default=["log_l1_loss"])
    p.add_argument("-sreg", "--scale_regularization", type=float, default=0.01)
    p.add_argument("-la", "--lam", nargs="+", type=float, default=[1.0])
    p.add_argument("-lw", "--lam_weak", type=float, default=100.0)
    p.add_argument("-lim1", "--limit1", type=int, default=9_000_000)
    p.add_argument("-lim2", "--limit2", type=int, default=9_000_000)
    p.add_argument("-lim3", "--limit3", type=int, default=13_000_000)
    p.add_argument("-wd", "--weightdecay", type=float, default=0.0)
    p.add_argument("-lrs", "--lr_step", type=int, default=5)
    p.add_argument("-lrg", "--lr_gamma", type=float, default=0.75)
    p.add_argument("-gc", "--gradient_clip", type=float, default=0.01)
    p.add_argument("-ascAug", "--ascAug", action="store_true")
    p.add_argument("--save_dir", default="outputs")
    p.add_argument("-w", "--num_workers", type=int, default=6)
    p.add_argument("-lt", "--logstep_train", type=int, default=25)
    p.add_argument("-val", "--val_every_n_epochs", type=int, default=2)
    p.add_argument("-wv", "--weak_validation", action="store_true")
    p.add_argument("-vi", "--val_every_i_steps", type=int, default=500_000)
    p.add_argument("-testi", "--test_every_i_steps", type=int, default=500_000)
    p.add_argument("--seed", type=int, default=1600)
    p.add_argument("--save-model", dest="save_model", default="both",
                   choices=["last", "best", "no", "both"])
    p.add_argument("--skip-first", dest="skip_first", action="store_true",
                   help="don't optimize during the first epoch")
    p.add_argument("-ms", "--max_samples", type=int, default=None,
                   help="cap on weak samples drawn per epoch")
    p.add_argument("--val_in_memory", action="store_true",
                   help="preload validation rasters into host RAM")
    p.add_argument("--watch_every", type=int, default=0,
                   help=">0: log per-layer gradient norms and parameter "
                        "histograms every N iters (reference wandb.watch)")
    p.add_argument("-mws", "--max_weak_samples", type=int, default=None)
    p.add_argument("-mwp", "--max_weak_pix", type=int, default=10_000_000)
    p.add_argument("-mpb", "--max_pix_box", type=int, default=12_000_000)
    p.add_argument("--device_feed", choices=("auto", "on", "off"), default="auto",
                   help="HBM-resident training feed: upload the training "
                        "regions' season mosaics to device once and assemble "
                        "batches on device (zero image bytes host->device "
                        "per step). auto = when single-process, NaN-free and "
                        "within the HBM budget; regions whose full stack "
                        "exceeds HBM fall back to SEASON ROTATION (one "
                        "season's slice resident at a time, uploaded once "
                        "per epoch), then to the host feed")
    p.add_argument("--quantize_eval", choices=["int8", "int8s", "w4a8"],
                   default=None,
                   help="run the IN-TRAINING evaluation paths (mid-epoch "
                        "test_target map stitching and weak validation) "
                        "through quantized inference; the train steps "
                        "themselves always stay full-precision (the "
                        "quantize gates are inference-only). Explicit "
                        "opt-in: quantized validation steers best-model "
                        "selection, bounded by the same census-R2 "
                        "acceptance test as eval --quantize "
                        "(tests/test_quantize_acceptance.py)")
    p.add_argument("--feed_gate", choices=("auto", "off", "host"),
                   default="auto",
                   help="rotation-vs-host cost gate (data/feed_select.py): "
                        "'auto' probes the link and a couple of host item "
                        "fetches and picks the faster epoch; 'off' keeps "
                        "rotation whenever it fits; 'host' forces the host "
                        "side of the fallback")
    p.add_argument("--transport", choices=("exact", "bf16"), default="exact",
                   help="data-plane dtype for float image modalities: "
                        "'bf16' ships/stores S1 (and float-sourced S2) as "
                        "bfloat16 — half the upload bytes and HBM "
                        "residency. Opt-in and lossy (~3 significant "
                        "digits on raw values, before normalization); "
                        "census-level accuracy pinned in "
                        "tests/test_transport.py")
    return p


def eval_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native POPCORN ensemble evaluation",
        fromfile_prefix_chars="@",
    )
    _add_common(p)
    p.add_argument("-r", "--resume", nargs="+", required=True,
                   help="ensemble member checkpoints (.pth torch or orbax dirs)")
    p.add_argument("-fs", "--fourseasons", action="store_true")
    p.add_argument("--seed", type=int, default=1610)
    p.add_argument("--save-dir", dest="save_dir", default="./results")
    p.add_argument("-w", "--num_workers", type=int, default=8)
    p.add_argument("--patch_batch", type=int, default=1)
    p.add_argument("--full", action="store_true", help="write detail maps")
    p.add_argument("--in_memory", action="store_true",
                   help="preload mosaics into RAM (reference arguments/eval.py:26)")
    p.add_argument("--device_feed", choices=("auto", "on", "off"), default="auto",
                   help="device-resident mosaic feed: upload each season's "
                        "mosaics to HBM once and run the sliding window as "
                        "on-device crops (no per-patch host->device "
                        "transfers). auto = when single-process, "
                        "device-stitched and NaN-free (NaN seasons fall "
                        "back to the healing host feed per patch)")
    p.add_argument("--patchsize", type=int, default=2048,
                   help="sliding-window patch size (reference constant "
                        "inference_patch_size=2048, utils/constants.py:12; "
                        "4096 cuts the halo-overlap waste from 31%% to 14%% "
                        "extra pixels on TPU HBM)")
    p.add_argument("--patch_overlap", type=int, default=128,
                   help="sliding-window halo (reference overlap=128)")
    p.add_argument("--spatial", action="store_true",
                   help="whole-region spatially-partitioned inference: each "
                        "season's full mosaics upload once with rows sharded "
                        "over the mesh's 'data' axis and every member runs "
                        "over the entire region in one sharded forward (XLA "
                        "halo exchange — no overlap recompute, no stitch, "
                        "true model output in the border ring the stitched "
                        "path zeroes). Needs the region to fit sharded in "
                        "HBM; pods or single chips with small regions")
    # eval CLI flag; the training CLI exposes the same modes as the
    # EXPLICIT --quantize_eval (it affects mid-training validation and
    # best-model selection, so it must never be implied)
    p.add_argument("--quantize", choices=["int8", "int8s", "w4a8"],
                   default=None,
                   help="int8 W8A8 inference through the fused Pallas "
                        "kernels (2x MXU peak on v5e). 'int8' = dynamic "
                        "per-slab activation scales; 'int8s' = static "
                        "calibrated scales with int8 block I/O — the "
                        "recommended fast path (+14%% end-to-end, census "
                        "R2 within the pinned acceptance bound); 'w4a8' "
                        "= int8s with int4-grid weights (measured loser "
                        "on v5e, kept for the record — PERF_NOTES)")
    p.add_argument("--transport", choices=("exact", "bf16"), default="exact",
                   help="data-plane dtype for float image modalities: "
                        "'bf16' ships/stores S1 (and float-sourced S2) as "
                        "bfloat16 — half the upload bytes and HBM "
                        "residency. Opt-in and lossy (~3 significant "
                        "digits on raw values, before normalization); "
                        "census-level accuracy pinned in "
                        "tests/test_transport.py")
    return p


def model_config_from_args(a) -> ModelConfig:
    import jax

    fused = a.fused_head
    if fused is None:
        fused = jax.default_backend() == "tpu"
    return ModelConfig(
        s1=a.Sentinel1,
        s2=a.Sentinel2,
        nir=a.NIR,
        viirs=a.VIIRS,
        occupancy_model=a.occupancymodel,
        pretrained=a.pretrained,
        biasinit=a.biasinit,
        sentinel_buildings=a.sentinelbuildings,
        building_input=a.buildinginput,
        segmentation_input=a.segmentationinput,
        feature_extractor=a.feature_extractor,
        compute_dtype=a.compute_dtype,
        fused_head=fused,
        quantize=getattr(a, "quantize", None)
        or getattr(a, "quantize_eval", None),
        pallas_stream=getattr(a, "pallas_stream", None),
        remat_unet=getattr(a, "remat_unet", False),
    )


def train_config_from_args(a) -> TrainConfig:
    return TrainConfig(
        target_regions=tuple(a.target_regions),
        target_regions_train=tuple(a.target_regions_train),
        train_level=tuple(a.train_level),
        weak_batch_size=a.weak_batch_size,
        weak_val_batch_size=a.weak_val_batch_size,
        num_epochs=a.num_epochs,
        learning_rate=a.learning_rate,
        loss=tuple(a.loss),
        lam=tuple(a.lam),
        lam_weak=a.lam_weak,
        scale_regularization=a.scale_regularization,
        weight_decay=a.weightdecay,
        lr_step=a.lr_step,
        lr_gamma=a.lr_gamma,
        gradient_clip=a.gradient_clip,
        seed=a.seed,
        limit1=a.limit1,
        limit2=a.limit2,
        limit3=a.limit3,
        max_weak_samples=a.max_weak_samples,
        max_weak_pix=a.max_weak_pix,
        max_pix_box=a.max_pix_box,
        weak_validation=a.weak_validation,
        val_every_n_epochs=a.val_every_n_epochs,
        val_every_i_steps=a.val_every_i_steps,
        test_every_i_steps=a.test_every_i_steps,
        logstep_train=a.logstep_train,
        asc_aug=a.ascAug,
        save_dir=a.save_dir,
        num_workers=a.num_workers,
        save_model=a.save_model,
        skip_first=a.skip_first,
        max_samples=a.max_samples,
        val_in_memory=a.val_in_memory,
        data_parallel=a.data_parallel,
        multihost=a.multihost,
        watch_every=a.watch_every,
        device_feed=getattr(a, "device_feed", "auto"),
        spatial_train=getattr(a, "spatial_train", False),
        grad_accum=_validated_grad_accum(a),
        transport=getattr(a, "transport", "exact"),
        feed_gate=getattr(a, "feed_gate", "auto"),
    )


def _validated_grad_accum(a) -> int:
    """--grad_accum must divide the configured batch size, else every full
    batch would silently take the single-shot fallback (meant only for an
    epoch's indivisible tail batch) and the flag's HBM saving never
    materializes."""
    accum = max(1, getattr(a, "grad_accum", 1))
    wb = getattr(a, "weak_batch_size", None)
    if accum > 1 and wb and wb % accum != 0:
        raise SystemExit(
            f"--grad_accum {accum} does not divide --weak_batch_size {wb}: "
            "full batches would run un-accumulated (no memory saving). "
            "Pick a divisor of the batch size."
        )
    return accum


def eval_config_from_args(a) -> EvalConfig:
    return EvalConfig(
        target_regions=tuple(a.target_regions),
        train_level=tuple(a.train_level),
        checkpoints=tuple(a.resume),
        fourseasons=a.fourseasons,
        seed=a.seed,
        save_dir=a.save_dir,
        num_workers=a.num_workers,
        patch_batch=a.patch_batch,
        in_memory=getattr(a, "in_memory", False),
        device_feed=getattr(a, "device_feed", "auto"),
        patchsize=getattr(a, "patchsize", 2048),
        overlap=getattr(a, "patch_overlap", 128),
        spatial=getattr(a, "spatial", False),
        transport=getattr(a, "transport", "exact"),
    )

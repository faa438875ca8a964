"""PyTorch-checkpoint -> JAX parameter-tree converter.

Converts the released POPCORN weights so the TPU framework can run the
published models at numerical parity:

  * the frozen DDA dual-stream UNet checkpoint
    (reference: model/DDA_model/checkpoints/networks/
     fusionda_newAug8_16_checkpoint30_lossweight0.5.pt, loaded at
     model/DDA_model/utils/networks.py:32-46 with strict=False and the
     discriminator stripped), and
  * full POPCORN training checkpoints (.pth with a 'model' state dict,
    reference run_train.py:445-456 / run_eval.py:243-257).

Layout conversions (torch NCHW -> our NHWC trees):
  conv3x3  (O,I,3,3)  -> HWIO (3,3,I,O)
  conv1x1  (O,I,1,1)  -> (I,O) channel matmul
  convT2x2 (I,O,2,2)  -> (I,2,2,O)
  BatchNorm(gamma,beta,mean,var) -> frozen affine
      scale = gamma / sqrt(var + eps), shift = beta - mean * scale
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..config import BN_EPS, ModelConfig, find_dda_checkpoint

Tree = Dict[str, Any]


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into a flat {name: np.float32 array} dict.

    Accepts both the DDA checkpoint ({'network': sd, ...}) and POPCORN
    training checkpoints ({'model': sd, ...}); raw state dicts pass through.
    """
    import torch  # CPU torch, used only for deserialisation

    ck = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ck, dict) and "network" in ck:
        sd = ck["network"]
    elif isinstance(ck, dict) and "model" in ck:
        sd = ck["model"]
    else:
        sd = ck
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy().astype(np.float32)
    return out


def load_torch_checkpoint_meta(path: str) -> Dict[str, Any]:
    """Return non-weight fields (epoch, iter) of a POPCORN .pth checkpoint."""
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    return {k: v for k, v in ck.items() if k in ("epoch", "iter", "step")}


# -- low-level tensor conversions -------------------------------------------


def _conv_w(a: np.ndarray) -> np.ndarray:
    return np.transpose(a, (2, 3, 1, 0))  # OIHW -> HWIO


def _conv1x1_w(a: np.ndarray) -> np.ndarray:
    return a[:, :, 0, 0].T.copy()  # (O,I,1,1) -> (I,O)


def _tconv_w(a: np.ndarray) -> np.ndarray:
    return np.transpose(a, (0, 2, 3, 1))  # (I,O,kh,kw) -> (I,kh,kw,O)


def _bn(sd: Dict[str, np.ndarray], prefix: str) -> Tree:
    gamma = sd[f"{prefix}.weight"]
    beta = sd[f"{prefix}.bias"]
    mean = sd[f"{prefix}.running_mean"]
    var = sd[f"{prefix}.running_var"]
    scale = gamma / np.sqrt(var + BN_EPS)
    shift = beta - mean * scale
    return {"scale": scale.astype(np.float32), "shift": shift.astype(np.float32)}


def _conv(sd, name) -> Tree:
    return {"w": _conv_w(sd[f"{name}.weight"]), "b": sd[f"{name}.bias"]}


def _double_conv(sd, prefix: str) -> Tuple[Tree, Tree]:
    """A torch DoubleConv Sequential: 0=conv,1=bn,3=conv,4=bn."""
    params = {"conv1": _conv(sd, f"{prefix}.0"), "conv2": _conv(sd, f"{prefix}.3")}
    bn = {"bn1": _bn(sd, f"{prefix}.1"), "bn2": _bn(sd, f"{prefix}.4")}
    return params, bn


def _stream(sd: Dict[str, np.ndarray], p: str) -> Tuple[Tree, Tree]:
    """One UNet stream from checkpoint prefix p (e.g. 'sar_stream.').

    The stream-level 'outc' present in the checkpoint is unused in the
    dual-stream feature path (networks.py enable_outc=False) and skipped.
    """
    params: Tree = {}
    bn: Tree = {}
    params["inc"], bn["inc"] = _double_conv(sd, f"{p}inc.conv.conv")
    params["down1"], bn["down1"] = _double_conv(sd, f"{p}down_seq.down1.mpconv.1.conv")
    params["down2"], bn["down2"] = _double_conv(sd, f"{p}down_seq.down2.mpconv.1.conv")
    for up in ("up2", "up1"):
        conv, upbn = _double_conv(sd, f"{p}up_seq.{up}.conv.conv")
        params[up] = {
            "tconv": {
                "w": _tconv_w(sd[f"{p}up_seq.{up}.up.weight"]),
                "b": sd[f"{p}up_seq.{up}.up.bias"],
            },
            "conv": conv,
        }
        bn[up] = upbn
    return params, bn


def _out_conv(sd, name) -> Tree:
    return {"w": _conv1x1_w(sd[f"{name}.weight"]), "b": sd[f"{name}.bias"]}


def dual_stream_to_tree(
    sd: Dict[str, np.ndarray], prefix: str = ""
) -> Tuple[Tree, Tree]:
    """Convert a DualStreamUNet state dict (optionally under `prefix`)."""
    sub = (
        {k[len(prefix) :]: v for k, v in sd.items() if k.startswith(prefix)}
        if prefix
        else sd
    )
    sar_p, sar_bn = _stream(sub, "sar_stream.")
    opt_p, opt_bn = _stream(sub, "optical_stream.")
    params = {
        "sar": sar_p,
        "opt": opt_p,
        "sar_out": _out_conv(sub, "sar_out_conv.conv"),
        "opt_out": _out_conv(sub, "optical_out_conv.conv"),
        "fusion_out": _out_conv(sub, "fusion_out_conv.conv"),
    }
    bn = {"sar": sar_bn, "opt": opt_bn}
    return params, bn


def head_to_tree(sd: Dict[str, np.ndarray], prefix: str = "head.") -> Tree:
    """Convert the 4-layer 1x1-conv head (torch Sequential indices 0,2,4,6)."""
    head = {}
    for i, idx in enumerate((0, 2, 4, 6)):
        head[f"l{i + 1}"] = {
            "w": _conv1x1_w(sd[f"{prefix}{idx}.weight"]),
            "b": sd[f"{prefix}{idx}.bias"],
        }
    return head


# -- public entry points ------------------------------------------------------


def load_dda_tree(path: Optional[str] = None) -> Tuple[Tree, Tree]:
    """Load the pretrained DDA dual-stream UNet as (params, bn) trees."""
    path = path or find_dda_checkpoint()
    if path is None:
        raise FileNotFoundError(
            "DDA checkpoint not found; set POPCORN_DDA_CHECKPOINT."
        )
    sd = load_torch_state(path)
    return dual_stream_to_tree(sd)


def load_popcorn_from_dda(
    cfg: ModelConfig,
    dda_path: Optional[str] = None,
    head_key=None,
) -> Tuple[Tree, Tree]:
    """Fresh POPCORN (params, consts) with pretrained DDA weights.

    Mirrors POPCORN.__init__ with pretrained=True (model/popcorn.py:57-97):
    both the feature extractor and the building extractor start from the
    same DDA checkpoint; the head is randomly initialised with the
    region-specific biasinit.
    """
    import jax

    from ..nn.init import init_head

    unet_params, unet_bn = load_dda_tree(dda_path)
    builder_params, builder_bn = load_dda_tree(dda_path)
    if head_key is None:
        head_key = jax.random.PRNGKey(0)
    params = {"unet": unet_params, "head": init_head(head_key, biasinit=cfg.biasinit)}
    consts = {
        "unet_bn": unet_bn,
        "builder": {"params": builder_params, "bn": builder_bn},
    }
    return params, consts


def load_popcorn_checkpoint(path: str) -> Tuple[Tree, Tree]:
    """Convert a full POPCORN .pth training checkpoint to (params, consts)."""
    sd = load_torch_state(path)
    unet_params, unet_bn = dual_stream_to_tree(sd, prefix="unetmodel.")
    builder_params, builder_bn = dual_stream_to_tree(sd, prefix="building_extractor.")
    params = {"unet": unet_params, "head": head_to_tree(sd)}
    consts = {
        "unet_bn": unet_bn,
        "builder": {"params": builder_params, "bn": builder_bn},
    }
    return params, consts


# -- export: JAX trees -> released torch .pth format --------------------------


def _inv_conv_w(a) -> "np.ndarray":
    return np.transpose(np.asarray(a, np.float32), (3, 2, 0, 1))  # HWIO -> OIHW


def _inv_conv1x1_w(a) -> "np.ndarray":
    return np.asarray(a, np.float32).T[:, :, None, None].copy()  # (I,O) -> (O,I,1,1)


def _inv_tconv_w(a) -> "np.ndarray":
    return np.transpose(np.asarray(a, np.float32), (0, 3, 1, 2))  # (I,kh,kw,O) -> (I,O,kh,kw)


def _inv_bn(bn: Tree, out: Dict[str, "np.ndarray"], prefix: str) -> None:
    """Folded (scale, shift) -> a torch BN with running_mean=0 and
    running_var=1-eps, so gamma/sqrt(var+eps) == scale EXACTLY and
    beta == shift. Inference through the reference's eval-mode BN is then
    bit-identical; the individual (gamma, mean, var) of the original
    checkpoint are not recoverable from the fold (and don't matter for
    frozen inference)."""
    scale = np.asarray(bn["scale"], np.float32)
    out[f"{prefix}.weight"] = scale
    out[f"{prefix}.bias"] = np.asarray(bn["shift"], np.float32)
    out[f"{prefix}.running_mean"] = np.zeros_like(scale)
    out[f"{prefix}.running_var"] = np.full_like(scale, 1.0 - BN_EPS)
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _inv_double_conv(p: Tree, bn: Tree, out, prefix: str) -> None:
    out[f"{prefix}.0.weight"] = _inv_conv_w(p["conv1"]["w"])
    out[f"{prefix}.0.bias"] = np.asarray(p["conv1"]["b"], np.float32)
    _inv_bn(bn["bn1"], out, f"{prefix}.1")
    out[f"{prefix}.3.weight"] = _inv_conv_w(p["conv2"]["w"])
    out[f"{prefix}.3.bias"] = np.asarray(p["conv2"]["b"], np.float32)
    _inv_bn(bn["bn2"], out, f"{prefix}.4")


def _inv_stream(p: Tree, bn: Tree, out, pre: str) -> None:
    _inv_double_conv(p["inc"], bn["inc"], out, f"{pre}inc.conv.conv")
    _inv_double_conv(p["down1"], bn["down1"], out, f"{pre}down_seq.down1.mpconv.1.conv")
    _inv_double_conv(p["down2"], bn["down2"], out, f"{pre}down_seq.down2.mpconv.1.conv")
    for up in ("up2", "up1"):
        out[f"{pre}up_seq.{up}.up.weight"] = _inv_tconv_w(p[up]["tconv"]["w"])
        out[f"{pre}up_seq.{up}.up.bias"] = np.asarray(p[up]["tconv"]["b"], np.float32)
        _inv_double_conv(p[up]["conv"], bn[up], out, f"{pre}up_seq.{up}.conv.conv")


def _inv_out_conv(p: Tree, out, name: str) -> None:
    out[f"{name}.weight"] = _inv_conv1x1_w(p["w"])
    out[f"{name}.bias"] = np.asarray(p["b"], np.float32)


def dual_stream_from_tree(params: Tree, bn: Tree, prefix: str = "") -> Dict:
    out: Dict[str, np.ndarray] = {}
    _inv_stream(params["sar"], bn["sar"], out, f"{prefix}sar_stream.")
    _inv_stream(params["opt"], bn["opt"], out, f"{prefix}optical_stream.")
    _inv_out_conv(params["sar_out"], out, f"{prefix}sar_out_conv.conv")
    _inv_out_conv(params["opt_out"], out, f"{prefix}optical_out_conv.conv")
    _inv_out_conv(params["fusion_out"], out, f"{prefix}fusion_out_conv.conv")
    # the reference UNet registers a per-stream outc unconditionally
    # (networks.py, even with enable_outc=False), and the reference loads
    # checkpoints with strict=True (run_eval.py:253) — emit zeros for the
    # keys our trees don't carry (no reference forward ever uses outc)
    for stream in ("sar_stream", "optical_stream"):
        out[f"{prefix}{stream}.outc.conv.weight"] = np.zeros((1, 8, 1, 1), np.float32)
        out[f"{prefix}{stream}.outc.conv.bias"] = np.zeros((1,), np.float32)
    return out


def save_popcorn_checkpoint(
    path: str, params: Tree, consts: Tree, epoch: int = 0, iteration: int = 0
) -> None:
    """Export (params, consts) to the reference's .pth training-checkpoint
    format (run_train.py:445-456: {'model': sd, 'epoch', 'iter'} with
    unetmodel.*/building_extractor.*/head.* keys) — the reverse of
    load_popcorn_checkpoint, so popcorn-tpu training results can be used
    by the original torch implementation. Frozen BN is exported as an
    equivalent eval-mode BN (see _inv_bn)."""
    import torch

    sd: Dict[str, np.ndarray] = {}
    sd.update(dual_stream_from_tree(params["unet"], consts["unet_bn"], "unetmodel."))
    sd.update(
        dual_stream_from_tree(
            consts["builder"]["params"], consts["builder"]["bn"],
            "building_extractor.",
        )
    )
    for i, idx in enumerate((0, 2, 4, 6)):
        sd[f"head.{idx}.weight"] = _inv_conv1x1_w(params["head"][f"l{i + 1}"]["w"])
        sd[f"head.{idx}.bias"] = np.asarray(params["head"][f"l{i + 1}"]["b"], np.float32)
    ck = {
        "model": {
            # copy=True: jax-derived arrays are non-writable views and
            # torch.from_numpy warns on them
            k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()
        },
        "epoch": epoch,
        "iter": iteration,
    }
    torch.save(ck, path)

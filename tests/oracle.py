"""Test oracle: import the reference PyTorch implementation (read-only).

The reference at /root/reference is used strictly as a *numerical oracle*
for golden-value parity tests (SURVEY.md §4: "golden-value tests against
the PyTorch reference, rtol 1e-3"). Nothing is copied; the module is
imported in place. fvcore (missing in this image) is stubbed out since
the networks module only needs it transitively for type annotations.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_fvcore():
    if "fvcore" in sys.modules:
        return
    fvcore = types.ModuleType("fvcore")
    common = types.ModuleType("fvcore.common")
    config = types.ModuleType("fvcore.common.config")

    class CfgNode(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    config.CfgNode = CfgNode
    fvcore.common = common
    common.config = config
    sys.modules["fvcore"] = fvcore
    sys.modules["fvcore.common"] = common
    sys.modules["fvcore.common.config"] = config


def load_reference_networks():
    """Import model.DDA_model.utils.networks from the reference tree."""
    _stub_fvcore()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module("model.DDA_model.utils.networks")


class Namespace:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def reference_dda_cfg():
    """The dda_cfg namespace (reference utils/constants.py:169-179) rebuilt
    locally so we never import the reference's path-probing constants."""
    return Namespace(
        MODEL=Namespace(
            TYPE="dualstreamunet", OUT_CHANNELS=1, IN_CHANNELS=6, TOPOLOGY=[8, 16]
        ),
        CONSISTENCY_TRAINER=Namespace(LOSS_FACTOR=0.5),
        PATHS=Namespace(OUTPUT=f"{REFERENCE_ROOT}/model/DDA_model/checkpoints/"),
        DATALOADER=Namespace(
            SENTINEL1_BANDS=["VV", "VH"], SENTINEL2_BANDS=["B02", "B03", "B04", "B08"]
        ),
        TRAINER=Namespace(LR=1e5),
        NAME="fusionda_newAug8_16",
    )


def load_reference_dda_model():
    """Instantiate the reference DualStreamUNet with the released weights."""
    networks = load_reference_networks()
    net, _, _ = networks.load_checkpoint(epoch=30, cfg=reference_dda_cfg(), device="cpu")
    net.eval()
    net.freeze_bn_layers()
    return net


def _stub_reference_constants():
    """Pre-register a CPU-safe ``utils.constants`` so importing
    model/popcorn.py never runs the reference's cluster-path probing
    (utils/constants.py:16-60 raises unless the author's scratch dirs
    exist). Provides exactly the names popcorn.py imports."""
    if "utils.constants" in sys.modules:
        return
    utils_pkg = types.ModuleType("utils")
    utils_pkg.__path__ = []  # mark as package
    constants = types.ModuleType("utils.constants")
    constants.dda_cfg = reference_dda_cfg()
    constants.stage1feats = 8  # reference utils/constants.py:170
    constants.stage2feats = 16  # reference utils/constants.py:171
    utils_pkg.constants = constants
    sys.modules["utils"] = utils_pkg
    sys.modules["utils.constants"] = constants


def load_reference_popcorn(
    *,
    input_channels: int = 6,
    occupancymodel: bool = True,
    sentinelbuildings: bool = True,
    biasinit: float = 0.9407,
    pretrained: bool = True,
    seed: int = 1600,
):
    """Instantiate the FULL reference POPCORN torch module on CPU.

    model/popcorn.py hard-codes device='cuda' (``load_checkpoint(...,
    device='cuda')`` at :57/:96 and ``.cuda()`` at :97); we patch the
    bound ``load_checkpoint`` and ``nn.Module.cuda`` to keep everything
    on CPU. The head is randomly initialised by torch (seeded here);
    parity tests convert the resulting state_dict so both frameworks
    share the exact same weights.
    """
    import torch

    _stub_fvcore()
    _stub_reference_constants()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    networks = importlib.import_module("model.DDA_model.utils.networks")
    orig_load = networks.load_checkpoint

    def _cpu_load(epoch, cfg, device):
        return orig_load(epoch, cfg, device="cpu")

    networks.load_checkpoint = _cpu_load
    orig_cuda = torch.nn.Module.cuda
    torch.nn.Module.cuda = lambda self, *a, **kw: self
    try:
        # (re)import model.popcorn AFTER the patches so its
        # ``from ... import load_checkpoint`` binds the CPU wrapper.
        if "model.popcorn" in sys.modules:
            popcorn_mod = sys.modules["model.popcorn"]
        else:
            popcorn_mod = importlib.import_module("model.popcorn")
        torch.manual_seed(seed)
        net = popcorn_mod.POPCORN(
            input_channels=input_channels,
            occupancymodel=occupancymodel,
            pretrained=pretrained,
            biasinit=biasinit,
            sentinelbuildings=sentinelbuildings,
        )
    finally:
        networks.load_checkpoint = orig_load
        torch.nn.Module.cuda = orig_cuda
    net.eval()
    return net

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

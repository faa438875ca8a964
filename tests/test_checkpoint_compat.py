"""Released-checkpoint compatibility: a torch .pth POPCORN training
checkpoint (unetmodel.* / head.* / building_extractor.* keys, the format
of run_train.py:445-456) converts to our trees and produces the same
forward as the directly-converted parts."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from conftest import reference_available
from popcorn_tpu.compat.torch_convert import (
    load_popcorn_checkpoint,
    load_torch_state,
)
from popcorn_tpu.config import ModelConfig, find_dda_checkpoint
from popcorn_tpu.nn.popcorn import popcorn_forward

pytestmark = pytest.mark.skipif(
    not find_dda_checkpoint(), reason="DDA checkpoint unavailable"
)


def _make_fake_pth(tmp_path):
    """Assemble a POPCORN .pth from the DDA state dict + a random head."""
    dda_sd = load_torch_state(find_dda_checkpoint())
    g = torch.Generator().manual_seed(0)
    sd = {}
    for k, v in dda_sd.items():
        sd[f"unetmodel.{k}"] = torch.from_numpy(v.copy())
        sd[f"building_extractor.{k}"] = torch.from_numpy(v.copy())
    dims = [(16, 64), (64, 64), (64, 64), (64, 2)]
    for idx, (ci, co) in zip((0, 2, 4, 6), dims):
        sd[f"head.{idx}.weight"] = torch.randn(co, ci, 1, 1, generator=g) * 0.1
        sd[f"head.{idx}.bias"] = torch.randn(co, generator=g) * 0.1
    path = str(tmp_path / "member.pth")
    torch.save({"model": sd, "epoch": 7, "iter": 123}, path)
    return path


@pytest.mark.slow
def test_pth_roundtrip_forward(tmp_path, rng):
    path = _make_fake_pth(tmp_path)
    params, consts = load_popcorn_checkpoint(path)

    # structural checks
    assert set(params) == {"unet", "head"}
    assert params["head"]["l1"]["w"].shape == (16, 64)
    assert consts["builder"]["params"]["fusion_out"]["w"].shape == (16, 1)

    # forward runs and matches the separately-converted DDA extractor
    from popcorn_tpu.compat.torch_convert import load_dda_tree
    from popcorn_tpu.nn.unet import dual_stream_features

    mcfg = ModelConfig(pretrained=True)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
    out = popcorn_forward(
        params, consts, {"input": x}, mcfg, padding=False
    )
    assert out["popdensemap"].shape == (1, 64, 64)
    assert np.isfinite(np.asarray(out["popcount"])).all()

    p_direct, bn_direct = load_dda_tree()
    f_ckpt = dual_stream_features(params["unet"], consts["unet_bn"], x)
    f_direct = dual_stream_features(p_direct, bn_direct, x)
    np.testing.assert_allclose(
        np.asarray(f_ckpt), np.asarray(f_direct), rtol=1e-6
    )

    from popcorn_tpu.compat.torch_convert import load_torch_checkpoint_meta

    meta = load_torch_checkpoint_meta(path)
    assert meta["epoch"] == 7 and meta["iter"] == 123


def test_evaluator_loads_pth(tmp_path):
    path = _make_fake_pth(tmp_path)
    from popcorn_tpu.infer.evaluator import load_member

    params, consts = load_member(path)
    assert consts is not None and "builder" in consts


@pytest.mark.slow
def test_single_dispatch_matches_split(tmp_path, rng):
    """make_patch_forward(single_dispatch=True) == the split prep/members.
    (slow tier: both dispatch modes run e2e in test_device_feed /
    test_evaluator; this pins their numerical identity directly.)"""
    from popcorn_tpu.config import ModelConfig
    from popcorn_tpu.data.normalize import NormStats
    from popcorn_tpu.infer.sliding import make_patch_forward, stack_ensemble
    from popcorn_tpu.nn.init import init_popcorn

    mcfg = ModelConfig(pretrained=False)
    params, consts = init_popcorn(jax.random.PRNGKey(1), mcfg)
    stacked = stack_ensemble([params])
    stats = NormStats()
    batch = {
        "S2": jnp.asarray(rng.uniform(0, 4000, (1, 64, 64, 4)).astype(np.float32)),
        "S1": jnp.asarray(rng.uniform(-25, 0, (1, 64, 64, 2)).astype(np.float32)),
        "mask": jnp.ones((1, 64, 64), jnp.float32),
        "valid": jnp.ones((1,), jnp.float32),
    }
    split = make_patch_forward(mcfg, consts, stats, 1)(stacked, batch)
    fused = make_patch_forward(mcfg, consts, stats, 1, single_dispatch=True)(
        stacked, batch
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        split,
        fused,
    )


def test_pth_export_roundtrip(tmp_path):
    """save_popcorn_checkpoint -> load_popcorn_checkpoint round-trips the
    trees exactly (BN fold preserved bit-exactly through the synthetic
    eval-mode BN), so TPU-trained models can be consumed by the original
    torch implementation."""
    from popcorn_tpu.compat.torch_convert import (
        load_popcorn_from_dda,
        save_popcorn_checkpoint,
    )

    mcfg = ModelConfig(pretrained=True)
    params, consts = load_popcorn_from_dda(mcfg, head_key=jax.random.PRNGKey(3))
    path = str(tmp_path / "export.pth")
    save_popcorn_checkpoint(path, params, consts, epoch=4, iteration=99)

    params2, consts2 = load_popcorn_checkpoint(path)
    for a, b in zip(
        jax.tree.leaves((params, consts)), jax.tree.leaves((params2, consts2))
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-6, atol=1e-7,
        )

    from popcorn_tpu.compat.torch_convert import load_torch_checkpoint_meta

    meta = load_torch_checkpoint_meta(path)
    assert meta["epoch"] == 4 and meta["iter"] == 99

    # the exported key set must match a reference-format checkpoint
    # EXACTLY — the reference loads with strict=True (run_eval.py:253)
    # and its UNet registers per-stream outc submodules unconditionally
    ref_sd = load_torch_state(_make_fake_pth(tmp_path))
    exp_sd = load_torch_state(path)
    assert set(exp_sd) == set(ref_sd), (
        sorted(set(ref_sd) - set(exp_sd)),
        sorted(set(exp_sd) - set(ref_sd)),
    )

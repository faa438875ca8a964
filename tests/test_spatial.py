"""Spatially-partitioned whole-frame inference (infer/spatial.py).

XLA SPMD spatial partitioning is semantics-preserving, so the row-sharded
map must match the single-device map to ULP on the f32 CPU mesh (the
partitioner tiles each conv's reduction differently, so a few elements
differ in the last bit); scalar reductions (count) differ by psum order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popcorn_tpu.config import ModelConfig
from popcorn_tpu.data.normalize import NormStats, normalize_and_assemble
from popcorn_tpu.dist.mesh import make_mesh
from popcorn_tpu.infer.spatial import (
    _pad_frame,
    make_spatial_builtup,
    spatial_builtup_map,
    spatial_density_map,
)
from popcorn_tpu.nn.init import init_popcorn
from popcorn_tpu.nn.popcorn import create_building_score, popcorn_forward


@pytest.fixture(scope="module")
def model():
    mcfg = ModelConfig(pretrained=False, fused_head=False)
    params, consts = init_popcorn(jax.random.PRNGKey(0), mcfg)
    return mcfg, params, consts


def _frame(h, w, seed=0):
    rng = np.random.default_rng(seed)
    s2 = rng.uniform(0, 4000, (h, w, 4)).astype(np.float32)
    s1 = rng.uniform(-25, 0, (h, w, 2)).astype(np.float32)
    return s2, s1


def test_pad_frame_multiples_and_crop():
    a = np.arange(10 * 7 * 2, dtype=np.float32).reshape(10, 7, 2)
    p, (ph, pw) = _pad_frame(a, 8, 4)
    assert p.shape == (16, 8, 2) and (ph, pw) == (6, 1)
    np.testing.assert_array_equal(p[:10, :7], a)
    # edge replication, not zeros
    np.testing.assert_array_equal(p[10:, :7], np.broadcast_to(a[-1:], (6, 7, 2)))
    b = a[:8, :4]
    p2, pads = _pad_frame(b, 8, 4)
    assert pads == (0, 0)
    assert p2 is b  # aligned input passes through uncopied


def test_spatial_density_matches_single_device(model):
    mcfg, params, consts = model
    mesh = make_mesh(8)
    h, w = 160, 96  # h % (4*8) == 0: no-pad path
    s2, s1 = _frame(h, w)
    m_sp, cnt = spatial_density_map(params, consts, mcfg, s2, s1, mesh)

    stats = NormStats()
    inputs = {"input": normalize_and_assemble(
        {"S2": jnp.asarray(s2[None]), "S1": jnp.asarray(s1[None])}, stats)}
    ref = popcorn_forward(
        params, consts, inputs, mcfg, train=False, padding=False, sparse=False
    )
    ref_map = np.asarray(ref["popdensemap"])[0]
    np.testing.assert_allclose(m_sp, ref_map, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cnt, ref_map.sum(), rtol=1e-5)


@pytest.mark.slow
def test_spatial_density_padded_frame(model):
    """Rows not divisible by 4*n_data: pad-with-edge then crop. The padded
    band influences the true rows only through the UNet's receptive field
    at the seam — identical to what any larger frame would do — so the
    cropped map must match the same-frame single-device run padded the
    same way."""
    mcfg, params, consts = model
    mesh = make_mesh(8)
    h, w = 100, 50  # pads to 128 x 64 (cols pad to the wide lane block, 32)
    s2, s1 = _frame(h, w, seed=3)
    m_sp, cnt = spatial_density_map(params, consts, mcfg, s2, s1, mesh)
    assert m_sp.shape == (h, w)

    s2p, _ = _pad_frame(s2, 32, 32)
    s1p, _ = _pad_frame(s1, 32, 32)
    stats = NormStats()
    inputs = {"input": normalize_and_assemble(
        {"S2": jnp.asarray(s2p[None]), "S1": jnp.asarray(s1p[None])}, stats)}
    ref = popcorn_forward(
        params, consts, inputs, mcfg, train=False, padding=False, sparse=False
    )
    ref_map = np.asarray(ref["popdensemap"])[0, :h, :w]
    np.testing.assert_allclose(m_sp, ref_map, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cnt, ref_map.sum(), rtol=1e-5)


def test_spatial_builtup_matches_single_device(model):
    mcfg, params, consts = model
    mesh = make_mesh(8)
    h, w = 96, 64
    s2, s1 = _frame(h, w, seed=5)
    m_sp = spatial_builtup_map(consts, mcfg, s2, s1, mesh)

    stats = NormStats()
    x = normalize_and_assemble(
        {"S2": jnp.asarray(s2[None]), "S1": jnp.asarray(s1[None])}, stats
    )
    ref = np.asarray(
        create_building_score(
            consts["builder"], x, s1=mcfg.s1, s2=mcfg.s2, nir=mcfg.nir,
            layout="plain",
        )
    )[0]
    np.testing.assert_allclose(m_sp, ref, rtol=1e-5, atol=1e-6)


def test_builtup_map_mesh_path_equals_patch_path(model):
    """builtup_map(mesh=...) must agree with the default patch-stitched
    path on a frame that fits one patch (where stitching is exact)."""
    mcfg, params, consts = model
    from popcorn_tpu.infer.timeseries import builtup_map

    mesh = make_mesh(8)
    h, w = 96, 64
    s2, s1 = _frame(h, w, seed=7)
    via_mesh = builtup_map(consts, mcfg, s2, s1, mesh=mesh)
    via_patch = builtup_map(consts, mcfg, s2, s1, patchsize=1024)
    # patch path uses the packed engine ('auto'), mesh path plain NHWC:
    # same math, different layout -> allclose, not bit-equal
    np.testing.assert_allclose(via_mesh, via_patch, rtol=2e-5, atol=2e-6)


def test_patch_stitch_zeroes_border_ring_spatial_fills_it(model):
    """The patch-stitched path inherits the reference's halo convention:
    the frame's outer `overlap` ring has stitch count 0 and is zeroed,
    while interiors equal the exact whole-frame output (overlap > the
    builder's receptive field). --spatial computes the true border ring."""
    mcfg, params, consts = model
    from popcorn_tpu.infer.timeseries import builtup_map

    # overlap must exceed the builder's receptive radius (~22 px: two
    # pool levels of double 3x3 convs) or reflect-pad contamination
    # legitimately leaks past the halo mask
    h, w, ps, ov = 256, 256, 128, 32
    s2, s1 = _frame(h, w, seed=11)
    stitched = builtup_map(consts, mcfg, s2, s1, patchsize=ps, overlap=ov)
    mesh = make_mesh(8)
    exact = builtup_map(consts, mcfg, s2, s1, mesh=mesh)

    assert (stitched[:ov] == 0).all() and (stitched[:, :ov] == 0).all()
    assert (stitched[-ov:] == 0).all() and (stitched[:, -ov:] == 0).all()
    assert np.abs(exact[:ov]).max() > 0  # spatial fills the ring
    m = 2 * ov
    np.testing.assert_allclose(
        stitched[m:-m, m:-m], exact[m:-m, m:-m], rtol=2e-4, atol=2e-5
    )


def test_spatial_fn_reuse_two_frames(model):
    """The jitted spatial builtup fn is shape-polymorphic per shape bucket
    and reusable across frames (one compile per padded shape)."""
    mcfg, params, consts = model
    mesh = make_mesh(8)
    fn = make_spatial_builtup(consts, mcfg, mesh)
    for seed in (1, 2):
        s2, s1 = _frame(64, 64, seed=seed)
        out = spatial_builtup_map(consts, mcfg, s2, s1, mesh, _fn=fn)
        assert out.shape == (64, 64)
        assert np.isfinite(out).all()


@pytest.mark.slow
def test_spatial_train_step_matches_single_device(model):
    """--spatial_train: the SAME jitted train step with the sample's rows
    sharded over 'data' (shard_batch_spatial) must produce the
    single-device result — XLA inserts halo exchanges for the convs and
    psums the spatial loss reductions; the math is unchanged."""
    from popcorn_tpu.config import TrainConfig
    from popcorn_tpu.dist.mesh import shard_batch_spatial
    from popcorn_tpu.train.state import make_optimizer, make_train_step

    mcfg, params, consts = model
    tcfg = TrainConfig()
    rng = np.random.default_rng(4)
    b, h, w = 1, 64, 64
    batch = {
        "S2": rng.uniform(0, 4000, (b, h, w, 4)).astype(np.float32),
        "S1": rng.uniform(-25, 0, (b, h, w, 2)).astype(np.float32),
        "admin_mask": np.ones((b, h, w), np.float32),
        "census_idx": np.ones((b,), np.float32),
        "y": np.asarray([400.0], np.float32),
        "photometric": np.asarray([1.0, 0.9, 1.0, 1.1], np.float32),
    }
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = make_train_step(mcfg, tcfg, consts, NormStats(), optimizer)
    key = jax.random.PRNGKey(5)

    p_ref, _, aux_ref = step(params, opt_state, batch, key)

    mesh = make_mesh(8)
    dev_batch = shard_batch_spatial(
        batch, mesh, row_keys=("S2", "S1", "admin_mask")
    )
    p_sp, _, aux_sp = step(params, opt_state, dev_batch, key)

    np.testing.assert_allclose(
        float(aux_sp["optimization_loss"]),
        float(aux_ref["optimization_loss"]), rtol=1e-5,
    )
    for a, b_ in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-7
        )


def test_chunked_building_score_matches_whole_frame(model):
    """Row-chunked builder (single-device big frames) equals the
    whole-frame builder to the established halo bound: each strip carries
    64 rows of true context > the builder's ~45 px receptive field."""
    import dataclasses

    import jax.numpy as jnp

    from popcorn_tpu.data.normalize import NormStats, normalize_and_assemble
    from popcorn_tpu.infer.spatial import chunked_building_score
    from popcorn_tpu.nn.popcorn import create_building_score

    mcfg, params, consts = model
    h, w = 256, 64
    s2, s1 = _frame(h, w, seed=11)
    x = normalize_and_assemble(
        {"S2": jnp.asarray(s2[None]), "S1": jnp.asarray(s1[None])}, NormStats()
    )
    mcfg_sp = dataclasses.replace(mcfg, layout="spatial")
    chunked = np.asarray(
        chunked_building_score(consts, x, mcfg_sp, None, rows_per_chunk=64)
    )
    whole = np.asarray(
        create_building_score(
            consts["builder"], x, s1=mcfg.s1, s2=mcfg.s2, nir=mcfg.nir,
            dtype=None, layout="spatial",
        )
    )
    np.testing.assert_allclose(chunked, whole, rtol=1e-5, atol=1e-6)


def test_strip_fold_matches_whole_frame(model, monkeypatch):
    """Single-device member strip fold (big frames) equals the whole-frame
    member scan to the 64-row halo bound."""
    import popcorn_tpu.infer.spatial as sp
    from popcorn_tpu.infer.sliding import stack_ensemble
    from popcorn_tpu.infer.spatial import make_spatial_ensemble
    from popcorn_tpu.nn.init import init_head

    mcfg, params, consts = model
    members = []
    for seed in (1, 2):
        m = dict(params)
        m["head"] = init_head(jax.random.PRNGKey(seed), biasinit=0.5)
        members.append(m)
    stacked = stack_ensemble(members)
    h, w = 256, 64
    s2, s1 = _frame(h, w, seed=13)
    sample = {"S2": jnp.asarray(s2[None]), "S1": jnp.asarray(s1[None])}

    def run():
        fold = make_spatial_ensemble(mcfg, consts, NormStats(), 2)
        acc = {k: jnp.zeros((h, w), jnp.float32)
               for k in ("dense_sum", "dense_sq", "scale_sum", "scale_sq")}
        return {k: np.asarray(v) for k, v in fold(stacked, sample, acc).items()}

    whole = run()
    monkeypatch.setattr(sp, "_MEMBER_CHUNK_MIN_H", 128)
    monkeypatch.setattr(sp, "_MEMBER_CHUNK_ROWS", 64)
    monkeypatch.setattr(sp, "_CHUNK_MIN_H", 128)
    strips = run()
    for k in whole:
        np.testing.assert_allclose(
            strips[k], whole[k], rtol=1e-5, atol=1e-6, err_msg=k
        )

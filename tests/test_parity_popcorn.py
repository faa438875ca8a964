"""Golden parity: the FULL POPCORN composition vs the reference torch module.

Round-1 parity tests covered the DDA extractor and the building score in
isolation; this file instantiates the reference's complete POPCORN module
(model/popcorn.py:13-377, loaded on CPU via tests/oracle.py) and asserts
end-to-end parity of popdensemap / scale / popcount for:

  * occupancy + on-the-fly sentinel buildings, reflect-pad-14 (padding=True)
  * externally supplied building_counts (sentinelbuildings=False)
  * padding=False odd-shape path (pad-to-multiple-of-64, popcorn.py:246-256)
  * the S1-only and S2-only channel-reorder branches (popcorn.py:135-145)
  * occupancymodel=False (popdensemap = relu(head), popcorn.py:180-181)
  * reference sparse=True popcount == our dense popcount (the documented
    sparse/dense equivalence invariant, popcorn.py:195-228 + 361-377)

Weights are shared exactly: the reference module's state_dict is saved in
the released .pth format ({'model': sd}) and loaded through
compat.torch_convert.load_popcorn_checkpoint — so this also smokes the
converter against a REAL reference-constructed module (not a synthetic
state dict).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import reference_available
from oracle import load_reference_popcorn

import jax
import jax.numpy as jnp

from popcorn_tpu.compat.torch_convert import load_popcorn_checkpoint
from popcorn_tpu.config import ModelConfig
from popcorn_tpu.nn.popcorn import popcorn_forward

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

RTOL, ATOL = 1e-3, 1e-4


@pytest.fixture(scope="module")
def ref_model():
    return load_reference_popcorn(
        input_channels=6, occupancymodel=True, sentinelbuildings=True,
        biasinit=0.9407, pretrained=True, seed=1600,
    )


@pytest.fixture(scope="module")
def shared(ref_model, tmp_path_factory):
    """(params, consts) converted from the reference module's own weights
    via the released-.pth roundtrip."""
    path = tmp_path_factory.mktemp("ck") / "reference_real.pth"
    sd = ref_model.state_dict()
    torch.save({"model": sd, "epoch": 0, "iter": 0}, path)
    return load_popcorn_checkpoint(str(path))


def _inputs(rng, b=1, h=96, w=96, c=6):
    """Assembled input in our [R,G,B,NIR,VV,VH] NHWC order; the torch side
    receives the NCHW transpose (identical semantics, utils/utils.py:162-171)."""
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    return x


def _torch_in(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _cfg(**kw):
    base = dict(
        pretrained=True, occupancy_model=True, sentinel_buildings=True,
        biasinit=0.9407, compute_dtype="float32", layout="auto",
    )
    base.update(kw)
    return ModelConfig(**base)


def _assert_close(ours, ref, label):
    np.testing.assert_allclose(
        np.asarray(ours), ref, rtol=RTOL, atol=ATOL, err_msg=label
    )


def test_full_forward_occupancy_senbuilds(ref_model, shared, rng):
    params, consts = shared
    x = _inputs(rng, h=96, w=128)
    with torch.no_grad():
        ref = ref_model({"input": _torch_in(x)}, train=False, padding=True)
    ours = popcorn_forward(
        params, consts, {"input": jnp.asarray(x)}, _cfg(),
        train=False, padding=True, sparse=False,
    )
    _assert_close(ours["popdensemap"], ref["popdensemap"].numpy(), "popdensemap")
    _assert_close(ours["scale"], ref["scale"].numpy(), "scale")
    _assert_close(ours["popcount"], ref["popcount"].numpy(), "popcount")


@pytest.mark.slow
def test_full_forward_with_admin_mask(ref_model, shared, rng):
    params, consts = shared
    b, h, w = 2, 64, 96
    x = _inputs(rng, b=b, h=h, w=w)
    admin = (rng.integers(0, 4, (b, h, w))).astype(np.float32)
    census = np.asarray([1.0, 2.0], np.float32)
    with torch.no_grad():
        ref = ref_model(
            {
                "input": _torch_in(x),
                "admin_mask": torch.from_numpy(admin),
                "census_idx": torch.from_numpy(census),
            },
            train=False, padding=True,
        )
    ours = popcorn_forward(
        params, consts,
        {
            "input": jnp.asarray(x),
            "admin_mask": jnp.asarray(admin),
            "census_idx": jnp.asarray(census),
        },
        _cfg(), train=False, padding=True, sparse=False,
    )
    _assert_close(ours["popcount"], ref["popcount"].numpy(), "masked popcount")


def test_full_forward_counts_given(rng, shared):
    """sentinelbuildings=False with building_counts supplied in the batch
    (reference popcorn.py:112 skips create_building_score)."""
    ref_model = load_reference_popcorn(
        input_channels=6, occupancymodel=True, sentinelbuildings=False,
        biasinit=0.9407, pretrained=True, seed=1600,
    )
    path = "/tmp/_parity_counts.pth"
    torch.save({"model": ref_model.state_dict()}, path)
    params, consts = load_popcorn_checkpoint(path)

    b, h, w = 1, 64, 64
    x = _inputs(rng, b=b, h=h, w=w)
    counts = rng.uniform(0, 3, (b, h, w)).astype(np.float32)
    counts[counts < 1.0] = 0.0
    with torch.no_grad():
        ref = ref_model(
            {
                "input": _torch_in(x),
                "building_counts": torch.from_numpy(counts[:, None]),
            },
            train=False, padding=True,
        )
    ours = popcorn_forward(
        params, consts,
        {"input": jnp.asarray(x), "building_counts": jnp.asarray(counts)},
        _cfg(sentinel_buildings=False),
        train=False, padding=True, sparse=False,
    )
    _assert_close(ours["popdensemap"], ref["popdensemap"].numpy(), "popdensemap")
    _assert_close(ours["popcount"], ref["popcount"].numpy(), "popcount")


@pytest.mark.slow
def test_padding_false_odd_shape(ref_model, shared, rng):
    """padding=False pads H/W to multiples of 64 then reverts
    (popcorn.py:246-276); 70x90 exercises both axes."""
    params, consts = shared
    x = _inputs(rng, h=70, w=90)
    with torch.no_grad():
        ref = ref_model({"input": _torch_in(x)}, train=False, padding=False)
    ours = popcorn_forward(
        params, consts, {"input": jnp.asarray(x)}, _cfg(),
        train=False, padding=False, sparse=False,
    )
    _assert_close(ours["popdensemap"], ref["popdensemap"].numpy(), "popdensemap")
    _assert_close(ours["popcount"], ref["popcount"].numpy(), "popcount")


@pytest.mark.parametrize(
    "in_ch,s1,s2,nir",
    [(2, True, False, False), (4, False, True, True)],
    ids=["s1_only", "s2_only"],
)
def test_modality_branches(rng, in_ch, s1, s2, nir):
    """S1-only zero-fills the optical channels, S2-only the SAR channels
    (reference popcorn.py:135-145)."""
    ref_model = load_reference_popcorn(
        input_channels=in_ch, occupancymodel=True, sentinelbuildings=True,
        biasinit=0.9407, pretrained=True, seed=1601,
    )
    path = f"/tmp/_parity_mod_{in_ch}.pth"
    torch.save({"model": ref_model.state_dict()}, path)
    params, consts = load_popcorn_checkpoint(path)

    x = _inputs(rng, h=64, w=64, c=in_ch)
    with torch.no_grad():
        ref = ref_model({"input": _torch_in(x)}, train=False, padding=True)
    ours = popcorn_forward(
        params, consts, {"input": jnp.asarray(x)},
        _cfg(s1=s1, s2=s2, nir=nir),
        train=False, padding=True, sparse=False,
    )
    _assert_close(ours["popdensemap"], ref["popdensemap"].numpy(), "popdensemap")
    _assert_close(ours["popcount"], ref["popcount"].numpy(), "popcount")


@pytest.mark.slow
def test_no_occupancy(rng):
    """occupancymodel=False: popdensemap = relu(head out) directly."""
    ref_model = load_reference_popcorn(
        input_channels=6, occupancymodel=False, sentinelbuildings=True,
        biasinit=0.75, pretrained=True, seed=1602,
    )
    path = "/tmp/_parity_noocc.pth"
    torch.save({"model": ref_model.state_dict()}, path)
    params, consts = load_popcorn_checkpoint(path)

    x = _inputs(rng, h=64, w=96)
    with torch.no_grad():
        ref = ref_model({"input": _torch_in(x)}, train=False, padding=True)
    ours = popcorn_forward(
        params, consts, {"input": jnp.asarray(x)},
        _cfg(occupancy_model=False, biasinit=0.75),
        train=False, padding=True, sparse=False,
    )
    assert ref["scale"] is None and ours["scale"] is None
    _assert_close(ours["popdensemap"], ref["popdensemap"].numpy(), "popdensemap")
    _assert_close(ours["popcount"], ref["popcount"].numpy(), "popcount")


def test_reference_sparse_equals_our_dense(ref_model, shared, rng):
    """The reference's sparse head (train memory trick) must yield the same
    popcount as our dense evaluation: every pixel contributing to popcount
    is inside the reference's sparsity mask by construction (nn/popcorn.py
    docstring; reference popcorn.py:361-372)."""
    params, consts = shared
    b, h, w = 1, 96, 96
    x = _inputs(rng, b=b, h=h, w=w)
    admin = np.ones((b, h, w), np.float32)
    census = np.asarray([1.0], np.float32)
    tin = {
        "input": _torch_in(x),
        "admin_mask": torch.from_numpy(admin),
        "census_idx": torch.from_numpy(census),
    }
    with torch.no_grad():
        torch.manual_seed(7)
        ref_sparse = ref_model(dict(tin), train=True, padding=True, sparse=True)
    ours = popcorn_forward(
        params, consts,
        {
            "input": jnp.asarray(x),
            "admin_mask": jnp.asarray(admin),
            "census_idx": jnp.asarray(census),
        },
        _cfg(), train=False, padding=True, sparse=False,
    )
    _assert_close(
        ours["popcount"], ref_sparse["popcount"].numpy(), "sparse-vs-dense popcount"
    )


def test_converter_real_module_roundtrip(ref_model, shared):
    """The .pth converter applied to a REAL reference-built module maps
    every weight (not just the synthetic layouts of test_checkpoint_compat):
    head biases must carry the biasinit and the two extractor trees must
    both be populated."""
    params, consts = shared
    assert np.allclose(np.asarray(params["head"]["l4"]["b"]), 0.9407)
    for stream in ("sar", "opt"):
        assert "inc" in params["unet"][stream]
        assert "inc" in consts["builder"]["params"][stream]
    # feature extractor and building extractor were loaded from the same
    # DDA checkpoint -> identical weights in a pretrained module
    a = np.asarray(params["unet"]["sar"]["inc"]["conv1"]["w"])
    b = np.asarray(consts["builder"]["params"]["sar"]["inc"]["conv1"]["w"])
    np.testing.assert_array_equal(a, b)

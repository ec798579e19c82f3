"""End-to-end numerical parity against the reference PyTorch model (random-init,
eval mode) through the converted-weights path. Validates backbone geometry (pad-0
stem, dilated layer3, neck crop), DepthCorr heads, and the Refine decoder in one
sweep — any architectural deviation shows up as a mismatch here."""
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from siammask_tpu.models.siammask import SiamMaskSharp
from siammask_tpu.utils.torch_convert import convert_state_dict


@pytest.fixture(scope="module")
def oracle(reference_path):
    sys.path.insert(0, str(reference_path))
    sys.path.insert(0, str(reference_path / "experiments" / "siammask_sharp"))
    try:
        from custom import Custom  # noqa
        anchors = {"stride": 8, "ratios": [0.33, 0.5, 1, 2, 3], "scales": [8],
                   "round_dight": 0}
        torch.manual_seed(0)
        net = Custom(anchors=anchors)
        net.eval()
        yield net
    finally:
        sys.path.remove(str(reference_path))
        sys.path.remove(str(reference_path / "experiments" / "siammask_sharp"))


@pytest.fixture(scope="module")
def converted(oracle):
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    return convert_state_dict(state)


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def rel_err(a, b):
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(7)
    z = rng.uniform(0, 255, size=(1, 3, 127, 127)).astype(np.float32)
    x = rng.uniform(0, 255, size=(1, 3, 255, 255)).astype(np.float32)
    return z, x


def test_template_parity(oracle, converted, inputs):
    z, _ = inputs
    with torch.no_grad():
        oracle.template(torch.from_numpy(z))
    ref_zf = to_nhwc(oracle.zf)

    model = SiamMaskSharp()
    zf = model.apply(converted, jnp.asarray(np.transpose(z, (0, 2, 3, 1))),
                     method="template")
    zf = np.asarray(zf)
    assert zf.shape == ref_zf.shape == (1, 7, 7, 256)
    assert rel_err(zf, ref_zf) < 2e-4


def test_track_mask_and_refine_parity(oracle, converted, inputs):
    z, x = inputs
    with torch.no_grad():
        oracle.template(torch.from_numpy(z))
        score_t, loc_t, mask_t = oracle.track_mask(torch.from_numpy(x))
        refined_t = oracle.track_refine((7, 12))

    model = SiamMaskSharp()
    zf = model.apply(converted, jnp.asarray(np.transpose(z, (0, 2, 3, 1))),
                     method="template")
    out = model.apply(converted, zf, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      method="track_mask")

    assert rel_err(np.asarray(out.score), to_nhwc(score_t)) < 5e-4
    assert rel_err(np.asarray(out.loc), to_nhwc(loc_t)) < 5e-4
    assert rel_err(np.asarray(out.mask), to_nhwc(mask_t)) < 5e-4

    refined = model.apply(converted, out.skips, out.corr,
                          jnp.asarray([7, 12], dtype=jnp.int32),
                          method="track_refine")
    assert rel_err(np.asarray(refined), refined_t.detach().numpy()) < 5e-4


def test_refine_all_matches_torch_train_path(oracle, converted, inputs):
    """Training-path refine (all cells unfolded) against the reference pos=None
    path, on a training-sized 143x143 search (3x3 cells)."""
    z, _ = inputs
    rng = np.random.RandomState(8)
    x = rng.uniform(0, 255, size=(1, 3, 143, 143)).astype(np.float32)

    with torch.no_grad():
        zf_t = oracle.features(torch.from_numpy(z))
        feat_t, search_t = oracle.features.forward_all(torch.from_numpy(x))
        corr_t = oracle.mask_model.mask.forward_corr(zf_t, search_t)
        refined_t = oracle.refine_model(feat_t, corr_t)  # (L, 127*127)

    model = SiamMaskSharp()
    zf = model.apply(converted, jnp.asarray(np.transpose(z, (0, 2, 3, 1))),
                     method="template")
    out = model.apply(converted, zf, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      method="track_mask")
    refined = model.apply(converted, out.skips, out.corr, method="refine_all")
    assert refined.shape == refined_t.shape
    assert rel_err(np.asarray(refined), refined_t.detach().numpy()) < 5e-4


def test_invert_variables_round_trip(oracle, converted):
    """invert_variables is the exact inverse of convert_state_dict: the
    reference net's state_dict -> flax -> state_dict round-trips bit-exactly
    (names AND values), so the reference stack can run OUR checkpoints."""
    from siammask_tpu.utils.torch_convert import invert_variables

    ref_state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    back = invert_variables(converted)
    assert set(back) == set(ref_state)
    for name, ref_v in ref_state.items():
        if name.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[name], ref_v, err_msg=name)


def test_reference_net_loads_inverted_ours(oracle, converted):
    """The torch reference net strict-loads an inverted OUR-side tree and
    produces the same template features as our model — the direction the
    trained-weights parity run uses (ours -> reference)."""
    from siammask_tpu.utils.torch_convert import invert_variables

    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in invert_variables(converted).items()}
    oracle.load_state_dict(state, strict=True)

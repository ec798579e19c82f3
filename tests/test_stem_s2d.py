"""SpaceToDepthStem must be numerically identical to the direct 7x7/2 VALID
conv it lowers (same params, same linear map — reference resnet.py:154), for
values AND gradients, on every spatial size the model feeds it (search 255,
template 127, odd/even off-sizes). The Tracker's batch-1 latency clone turns
it on (tracker.py); training / batched serving keep the direct conv.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siammask_tpu.models.resnet import ResNet50Tracking, SpaceToDepthStem

import flax.linen as nn


def _direct_stem(kernel, x):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("hw", [(255, 255), (127, 127), (130, 131), (17, 24)])
def test_s2d_stem_matches_direct_conv(hw):
    h, w = hw
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32)) * 50.0
    mod = SpaceToDepthStem(16)
    variables = mod.init(jax.random.PRNGKey(0), x)
    kernel = variables["params"]["kernel"]
    assert kernel.shape == (7, 7, 3, 16)

    got = mod.apply(variables, x)
    want = _direct_stem(kernel, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_s2d_stem_gradients_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 63, 63, 3).astype(np.float32))
    mod = SpaceToDepthStem(8)
    variables = mod.init(jax.random.PRNGKey(1), x)

    def loss_s2d(v, x):
        return jnp.sum(jnp.sin(mod.apply(v, x)))

    def loss_direct(v, x):
        return jnp.sum(jnp.sin(_direct_stem(v["params"]["kernel"], x)))

    g1 = jax.grad(loss_s2d)(variables, x)["params"]["kernel"]
    g2 = jax.grad(loss_direct)(variables, x)["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)

    gx1 = jax.grad(loss_s2d, argnums=1)(variables, x)
    gx2 = jax.grad(loss_direct, argnums=1)(variables, x)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-5)


def test_backbone_agrees_across_stem_lowerings():
    """Same params through stem_s2d=True/False backbones -> same features."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 127, 127, 3).astype(np.float32)) * 20.0
    m_a = ResNet50Tracking(width=16, stem_s2d=True)
    m_b = ResNet50Tracking(width=16, stem_s2d=False)
    variables = m_a.init(jax.random.PRNGKey(2), x)
    # identical param trees: the lowering adds/renames nothing
    vb = m_b.init(jax.random.PRNGKey(3), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(vb))
    outs_a = m_a.apply(variables, x)
    outs_b = m_b.apply(variables, x)
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("hw", [(125, 125), (61, 61), (30, 33)])
def test_maxpool_slices_matches_reduce_window(hw):
    from siammask_tpu.models.resnet import maxpool_3x3s2_p1_slices
    h, w = hw
    rng = np.random.RandomState(3)
    # post-ReLU-like input incl. tied zeros (the real stem feed)
    x = jnp.asarray(np.maximum(rng.randn(2, h, w, 16), 0.0)
                    .astype(np.float32))
    want = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    got = maxpool_3x3s2_p1_slices(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("hw", [(125, 125), (61, 61), (30, 33), (7, 9)])
@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_maxpool_phase_matches_reduce_window(hw, dtype):
    """The phase-split lowering (latency-clone default) is bit-exact vs
    nn.max_pool for every stem geometry (125^2 search / 61^2 template) and
    both compute dtypes."""
    from siammask_tpu.models.resnet import maxpool_3x3s2_p1_phase
    h, w = hw
    rng = np.random.RandomState(3)
    x = jnp.asarray(np.maximum(rng.randn(2, h, w, 16), 0.0)
                    .astype(np.float32)).astype(dtype)
    want = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    got = maxpool_3x3s2_p1_phase(x)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tracker_latency_clone_uses_s2d_stem():
    """Batch-1 clone: s2d stem + shift thin convs; batched model: MXU defaults."""
    from siammask_tpu.config import TrackerConfig
    from siammask_tpu.models.siammask import SiamMaskSharp
    from siammask_tpu.tracker.tracker import Tracker

    t = Tracker(SiamMaskSharp(), TrackerConfig(), mask=True, refine=True)
    assert t.model_single.stem_s2d and t.model_single.thin_conv_threshold > 0
    assert t.model_single.maxpool_phase
    assert not t.model.stem_s2d and t.model.thin_conv_threshold == 0
    assert not t.model.maxpool_phase
    # parity harnesses opt out: single-stream paths run reference lowerings
    t_ref = Tracker(SiamMaskSharp(), TrackerConfig(), mask=True, refine=True,
                    latency_lowerings=False)
    assert t_ref.model_single is t_ref.model


def test_s2d_stem_is_param_compatible():
    """nn.Conv-era checkpoints load unchanged under the s2d lowering."""
    x = jnp.zeros((1, 127, 127, 3), jnp.float32)
    m = ResNet50Tracking(width=8, stem_s2d=True)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = nn.Conv(8, (7, 7), strides=(2, 2), padding="VALID", use_bias=False)
    vc = ref.init(jax.random.PRNGKey(0), x)
    assert (v["params"]["conv1"]["kernel"].shape
            == vc["params"]["kernel"].shape)


def test_s2d_stem_prepacked_input_matches_unpacked():
    """A 12-channel input is consumed as already s2d-packed (the crop emits
    the packed layout directly — ops/sample.py sample_packed): identical
    taps/weights mean the packed path is BIT-exact vs packing inside the
    stem, odd sizes included (the pad row/col only meets zero kernel taps)."""
    from siammask_tpu.ops.sample import sample_packed, subwindow_crop

    rng = np.random.RandomState(2)
    frame = jnp.asarray(rng.randint(0, 256, (240, 320, 3)), jnp.uint8)
    avg = jnp.mean(frame, axis=(0, 1), dtype=jnp.float32)
    args = (jnp.asarray([160.0, 120.0], jnp.float32), jnp.asarray(187.0))

    mod = SpaceToDepthStem(16)
    some_x = jnp.zeros((1, 255, 255, 3), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(3), some_x)

    for model_sz in (255, 127):
        crop = subwindow_crop(frame, args[0], args[1], model_sz, avg)
        packed = subwindow_crop(frame, args[0], args[1], model_sz, avg,
                                packed=True)
        out_unpacked = mod.apply(variables, crop[None])
        out_packed = mod.apply(variables, packed[None])
        np.testing.assert_array_equal(np.asarray(out_packed),
                                      np.asarray(out_unpacked))


def test_tracker_packed_mm_step_close_to_baseline():
    """One tracker step with the deployment sampling lowerings (packed s2d
    crop + mm sampler) must agree with the baseline gather step: same best
    cell, positions within a pixel, scores within bf16-rounding effects.
    (Closed-loop metric deltas of deployment lowerings are measured
    separately — PARITY_METRICS.md bf16 section.)"""
    from siammask_tpu.config import TrackerConfig
    from siammask_tpu.models.siammask import SiamMaskSharp
    from siammask_tpu.tracker.tracker import Tracker

    hp = {"instance_size": 255, "out_size": 127, "base_size": 8,
          "seg_thr": 0.3, "penalty_k": 0.04, "window_influence": 0.4,
          "lr": 1.0}
    model = SiamMaskSharp(width=8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 127, 127, 3), jnp.float32),
                           jnp.zeros((1, 255, 255, 3), jnp.float32))
    rng = np.random.RandomState(4)
    frame = jnp.asarray(rng.randint(0, 256, (120, 160, 3)), jnp.uint8)
    pos, sz = np.array([80.0, 60.0]), np.array([40.0, 50.0])

    p = TrackerConfig().update(hp)
    base = Tracker(model, p, mask=True, refine=True)
    fast = Tracker(model, p, mask=True, refine=True,
                   sample_impl="mm", crop_packed=True,
                   multi_sample_impl="mm", multi_crop_packed=True)

    st0 = base.init(variables, frame, pos, sz)
    _, out_b = base.step(variables, st0, frame)
    _, out_f = fast.step(variables, st0, frame)
    assert int(out_b.best_id) == int(out_f.best_id)
    np.testing.assert_allclose(np.asarray(out_f.target_pos),
                               np.asarray(out_b.target_pos), atol=1.0)
    np.testing.assert_allclose(float(out_f.score), float(out_b.score),
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(out_f.mask_in_frame),
                               np.asarray(out_b.mask_in_frame), atol=0.15)

    # batched path with the multi knobs: same contract
    stb = base.init_batched(variables, frame, pos[None], sz[None])
    _, ob = base.step_batched(variables, stb, frame)
    stf = fast.init_batched(variables, frame, pos[None], sz[None])
    _, of = fast.step_batched(variables, stf, frame)
    np.testing.assert_allclose(np.asarray(of.target_pos),
                               np.asarray(ob.target_pos), atol=1.0)

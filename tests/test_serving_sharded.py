"""Sharded multi-stream serving (parallel/serving.py) on the 8-device CPU
mesh: outputs must match the unsharded batched tracker exactly, state/output
shardings must land on the stream axis, and the partitioned hot loop must
contain no collectives (streams are independent)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siammask_tpu.config import TrackerConfig
from siammask_tpu.models.siammask import SiamMaskSharp
from siammask_tpu.parallel.mesh import data_parallel_mesh
from siammask_tpu.parallel.serving import ShardedStreamServer
from siammask_tpu.tracker.tracker import Tracker

HP = {"instance_size": 255, "out_size": 127, "base_size": 8, "seg_thr": 0.3,
      "penalty_k": 0.04, "window_influence": 0.4, "lr": 1.0}


@pytest.fixture(scope="module")
def setup():
    model = SiamMaskSharp(width=8)
    rng = np.random.RandomState(0)
    z = jnp.zeros((1, 127, 127, 3), jnp.float32)
    x = jnp.zeros((1, 255, 255, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), z, x)
    tracker = Tracker(model, TrackerConfig().update(HP), mask=True,
                      refine=True)
    frames = jnp.asarray(rng.randint(0, 255, (3, 120, 160, 3)), jnp.uint8)
    o = 8
    pos = rng.uniform(40, 120, (o, 2)).astype(np.float32)
    sz = rng.uniform(20, 60, (o, 2)).astype(np.float32)
    return tracker, variables, frames, pos, sz


def test_sharded_serving_matches_unsharded(setup):
    tracker, variables, frames, pos, sz = setup
    mesh = data_parallel_mesh()
    assert mesh.size == 8
    server = ShardedStreamServer(tracker, mesh)

    states = server.init_batched(variables, frames[0], pos, sz)
    # state leaves sharded on the stream axis
    assert states.target_pos.sharding.spec == jax.sharding.PartitionSpec(
        "data")
    st_sh, outs_sh = server.track_video(variables, states, frames)
    assert outs_sh.target_pos.sharding.spec[1] == "data"

    states_ref = tracker.init_batched(variables, frames[0], pos, sz)
    st_ref, outs_ref = tracker.track_video_multi(variables, states_ref,
                                                 frames)
    np.testing.assert_allclose(np.asarray(outs_sh.target_pos),
                               np.asarray(outs_ref.target_pos),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(outs_sh.score),
                               np.asarray(outs_ref.score),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(outs_sh.mask_in_frame),
                               np.asarray(outs_ref.mask_in_frame),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(st_sh.target_sz),
                               np.asarray(st_ref.target_sz),
                               rtol=1e-5, atol=1e-4)


def test_sharded_hot_loop_has_no_collectives(setup):
    tracker, variables, frames, pos, sz = setup
    server = ShardedStreamServer(tracker)
    states = server.init_batched(variables, frames[0], pos, sz)
    hlo = server._scan.lower(variables, states,
                             frames).compile().as_text()
    for coll in ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute"):
        assert coll not in hlo, f"unexpected {coll} in serving scan"


def test_stream_count_must_tile_mesh(setup):
    tracker, variables, frames, pos, sz = setup
    server = ShardedStreamServer(tracker)
    with pytest.raises(ValueError, match="multiple of the mesh"):
        server.init_batched(variables, frames[0], pos[:3], sz[:3])


def test_per_frame_step_matches_scan(setup):
    tracker, variables, frames, pos, sz = setup
    server = ShardedStreamServer(tracker)
    states = server.init_batched(variables, frames[0], pos, sz)
    st, outs = server.track_video(variables, states, frames)
    st2 = server.init_batched(variables, frames[0], pos, sz)
    for t in range(frames.shape[0]):
        st2, o2 = server.step(variables, st2, frames[t])
    np.testing.assert_allclose(np.asarray(st.target_pos),
                               np.asarray(st2.target_pos),
                               rtol=1e-5, atol=1e-4)


def test_sharded_serving_with_deployment_lowerings(setup):
    """The serving lowerings (mm sampler + packed s2d crop on the batched
    path) must behave identically under mesh sharding: sharded outputs ==
    unsharded outputs of the SAME lowered tracker, and the hot loop stays
    collective-free."""
    _, variables, frames, pos, sz = setup
    model = SiamMaskSharp(width=8)
    fast = Tracker(model, TrackerConfig().update(HP), mask=True, refine=True,
                   multi_sample_impl="mm", multi_crop_packed=True)
    server = ShardedStreamServer(fast, data_parallel_mesh())

    states = server.init_batched(variables, frames[0], pos, sz)
    st_sh, outs_sh = server.track_video(variables, states, frames)

    states_ref = fast.init_batched(variables, frames[0], pos, sz)
    st_ref, outs_ref = fast.track_video_multi(variables, states_ref, frames)
    np.testing.assert_allclose(np.asarray(outs_sh.target_pos),
                               np.asarray(outs_ref.target_pos),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(outs_sh.score),
                               np.asarray(outs_ref.score),
                               rtol=1e-5, atol=1e-4)
    hlo = server._scan.lower(variables, states, frames).compile().as_text()
    for coll in ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute"):
        assert coll not in hlo, f"unexpected {coll} in lowered serving scan"

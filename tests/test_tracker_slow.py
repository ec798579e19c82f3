"""Slow tracker tests (RUN_SLOW=1): scan-over-frames and batched multi-object
consistency with the sequential step, on the real model (heavy CPU compiles)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from siammask_tpu.config import TrackerConfig
from siammask_tpu.models.siammask import SiamMaskSharp
from siammask_tpu.tracker.tracker import Tracker

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="real-model tracker compiles are heavy on the 1-core host")

HP = {"instance_size": 255, "out_size": 127, "base_size": 8, "seg_thr": 0.3,
      "penalty_k": 0.04, "window_influence": 0.4, "lr": 1.0}


@pytest.fixture(scope="module")
def setup():
    model = SiamMaskSharp()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 127, 127, 3)),
                           jnp.zeros((1, 255, 255, 3)))
    p = TrackerConfig().update(HP)
    tracker = Tracker(model, p)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.uniform(0, 255, (3, 120, 160, 3)), jnp.float32)
    return tracker, variables, frames


def test_scan_matches_step_loop(setup):
    tracker, variables, frames = setup
    state = tracker.init(variables, frames[0], np.array([80.0, 60.0]),
                         np.array([40.0, 50.0]))
    st = state
    seq_pos = []
    for t in range(1, 3):
        st, out = tracker.step(variables, st, frames[t])
        seq_pos.append(np.asarray(out.target_pos))

    final, outs = tracker.track_video(variables, state, frames[1:])
    np.testing.assert_allclose(np.asarray(outs.target_pos), np.stack(seq_pos),
                               rtol=1e-5, atol=1e-4)


def test_batched_matches_sequential(setup):
    tracker, variables, frames = setup
    pos = np.array([[80.0, 60.0], [40.0, 30.0]])
    sz = np.array([[40.0, 50.0], [30.0, 20.0]])
    states = tracker.init_batched(variables, frames[0], pos, sz)
    bstates, bouts = tracker.step_batched(variables, states, frames[1])

    for o in range(2):
        s1 = tracker.init(variables, frames[0], pos[o], sz[o])
        _, out = tracker.step(variables, s1, frames[1])
        np.testing.assert_allclose(np.asarray(bouts.target_pos[o]),
                                   np.asarray(out.target_pos), rtol=1e-4,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(bouts.mask_in_frame[o]),
                                   np.asarray(out.mask_in_frame), atol=1e-3)

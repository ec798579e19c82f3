"""Real-model training-step test (RUN_SLOW=1): one full SiamMask-sharp
forward+backward+update on CPU. Compiling this graph takes many minutes on the
1-core test host; the persistent compilation cache makes reruns cheap."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from siammask_tpu.models.siammask import SiamMaskSharp
from siammask_tpu.train.trainer import (OptimizerConfig, TrainSettings,
                                        build_optimizer, make_train_step)
from tests.test_training import tiny_batch

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="real-model training compile takes many minutes on the 1-core host; "
           "set RUN_SLOW=1 (also covered by the driver's dryrun_multichip)")


def test_real_sharp_training_step():
    model = SiamMaskSharp()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 127, 127, 3)),
                           jnp.zeros((1, 143, 143, 3)))
    settings = TrainSettings(task="sharp", loss_weight=(1.0, 1.0, 36.0),
                             mask_pad=0)
    tx, _ = build_optimizer(variables["params"], OptimizerConfig(),
                            unfreeze_backbone=False)
    step = make_train_step(model, settings, tx, unfreeze_backbone=False)
    opt_state = tx.init(variables["params"])
    batch = jax.tree.map(jnp.asarray, tiny_batch(b=2))
    new_vars, _, metrics = step(variables, opt_state, batch, jnp.float32(0.005))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["skipped"]) == 0.0
    # frozen backbone stem untouched; heads moved
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["backbone"]["conv1"]["kernel"]),
        np.asarray(new_vars["params"]["backbone"]["conv1"]["kernel"]))
    assert not np.array_equal(
        np.asarray(variables["params"]["rpn"]["cls"]["head_conv2"]["kernel"]),
        np.asarray(new_vars["params"]["rpn"]["cls"]["head_conv2"]["kernel"]))

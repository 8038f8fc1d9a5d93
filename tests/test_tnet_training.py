"""TrackingNet training: loss decreases, pose error improves on the
training distribution."""

import jax
import numpy as np
import pytest

from banet_tpu.train.tracking_net_trainer import (create_tnet_state,
                                                  make_tnet_train_step,
                                                  tnet_synthetic_batch)


@pytest.mark.slow
def test_tnet_trains():
    net, state, tx = create_tnet_state(jax.random.PRNGKey(0),
                                       image_size=(32, 48),
                                       num_samples=8,
                                       learning_rate=1e-3)
    step = jax.jit(make_tnet_train_step(net, tx))
    first = None
    for i in range(12):
        batch = tnet_synthetic_batch(jax.random.PRNGKey(i), batch=2,
                                     height=32, width=48)
        state, m = step(state, batch)
        total = float(m["total"])
        assert np.isfinite(total)
        if first is None:
            first = total
    # With near-zero-motion init the pose loss starts at ~|gt motion|
    # and must shrink as the net learns the (small) average correction.
    assert total < first, (first, total)

"""The update(update_stem=, update_gp=) switches must actually gate the
gradient steps (reference ``OnlineSKIRegression.update`` lines 117-118)."""

import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.api import OnlineSKIRegression, LinearStem
from online_gp_tpu.data import sin_cos_dataset


def test_update_gp_false_freezes_hypers():
    tx, ty, *_ = sin_cos_dataset(n=200)
    r = OnlineSKIRegression(LinearStem(2, 2), tx[:50], ty[:50], lr=0.05, grid_size=10, grid_bound=1.0)
    params_before = jax.tree.map(lambda a: np.asarray(a).copy(), r.params)
    stem_before = jax.tree.map(lambda a: np.asarray(a).copy(), r.stem_params)

    r.update(tx[50:51], ty[50:51], update_stem=False, update_gp=False)
    # conditioning happened ...
    assert int(r.state.num_data) == 51
    # ... but neither parameter set moved
    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(r.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    for a, b in zip(jax.tree.leaves(stem_before), jax.tree.leaves(r.stem_params)):
        np.testing.assert_array_equal(a, np.asarray(b))

    r.update(tx[51:52], ty[51:52], update_stem=True, update_gp=True)
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(r.params))
    )
    assert moved

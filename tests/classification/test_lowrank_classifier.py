"""Low-rank (large-grid) Dirichlet classifier route."""

import jax
import numpy as np
import pytest

from online_gp_tpu.api.classification import OnlineSKIClassifier
from online_gp_tpu.api.lowrank_classification import OnlineSKILowRankClassifier
from online_gp_tpu.api.stems import IdentityStem
from online_gp_tpu.data.banana import banana_dataset


def test_explicit_low_rank_routes():
    tr_x, tr_y, te_x, te_y = banana_dataset(seed=0)
    w = OnlineSKIClassifier(IdentityStem(2), tr_x[:64], tr_y[:64],
                            grid_size=16, low_rank=64)
    assert isinstance(w, OnlineSKILowRankClassifier)
    assert w.model.rank == 64


@pytest.mark.slow
def test_big_grid_auto_routes_and_learns_banana():
    """grid 72^2 = 5184 > DENSE_GRID_LIMIT auto-routes to the rank-capped
    core; banana stays learnable through fit + streaming updates."""
    tr_x, tr_y, te_x, te_y = banana_dataset(seed=0)
    n_init = 200
    w = OnlineSKIClassifier(IdentityStem(2), tr_x[:n_init], tr_y[:n_init],
                            grid_size=72, lr=0.05, low_rank=256)
    assert isinstance(w, OnlineSKILowRankClassifier)
    w.fit(tr_x[:n_init], tr_y[:n_init], num_epochs=30)
    for i in range(n_init, n_init + 120, 4):
        w.update(tr_x[i : i + 4], tr_y[i : i + 4], update_stem=False)
    acc = w.evaluate(te_x, te_y)
    assert np.isfinite(acc)
    assert acc >= 0.8, f"banana acc {acc}"


def test_small_grid_stays_dense():
    tr_x, tr_y, te_x, te_y = banana_dataset(seed=0)
    w = OnlineSKIClassifier(IdentityStem(2), tr_x[:64], tr_y[:64], grid_size=16)
    assert type(w) is OnlineSKIClassifier

"""Checkpoint roundtrip + BayesOpt adapter + maintenance utilities."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.api import OnlineSKIRegression, IdentityStem
from online_gp_tpu.data import sin_cos_dataset
from online_gp_tpu.utils.checkpoint import save_wrapper, load_wrapper, save_pytree, load_pytree
from online_gp_tpu.models import wiski_check_decomposition, wiski_refresh_roots
from online_gp_tpu.models.wiski_bayesopt import WiskiBayesOptModel


def _fitted(tmpdir=None):
    tx, ty, ex, ey = sin_cos_dataset(n=300)
    r = OnlineSKIRegression(IdentityStem(2), tx[:50], ty[:50], lr=0.05, grid_size=12, grid_bound=1.0)
    r.fit(tx[:200], ty[:200], num_epochs=15)
    return r, (tx, ty, ex, ey)


def test_checkpoint_roundtrip(tmp_path):
    r, (tx, ty, ex, ey) = _fitted()
    rmse0, _ = r.evaluate(ex, ey)
    path = str(tmp_path / "ck")
    save_wrapper(path, r)
    r2 = OnlineSKIRegression(IdentityStem(2), tx[:50], ty[:50], lr=0.05, grid_size=12, grid_bound=1.0)
    load_wrapper(path, r2)
    rmse1, _ = r2.evaluate(ex, ey)
    assert abs(rmse0 - rmse1) < 1e-7


def test_pytree_checkpoint_mismatch_raises(tmp_path):
    path = str(tmp_path / "t")
    save_pytree(path, {"a": jnp.ones(3)})
    try:
        load_pytree(path, {"a": jnp.ones(3), "b": jnp.ones(2)})
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_same_leaf_count_different_structure_raises(tmp_path):
    """Index-based restore into a same-leaf-count exemplar with different
    field layout must fail loudly, not scramble fields."""
    path = str(tmp_path / "t")
    save_pytree(path, {"a": jnp.ones(3), "b": jnp.zeros(2)})
    try:
        load_pytree(path, {"a": jnp.ones(3), "c": jnp.zeros(2)})
        assert False, "expected ValueError"
    except ValueError as e:
        assert "structure mismatch" in str(e)


def test_exemplar_free_restore_rebuilds_namedtuples(tmp_path):
    """The structure JSON is self-describing: NamedTuple node types are
    reconstructed without an exemplar."""
    from online_gp_tpu.models.sgpr import SGPRMoments

    path = str(tmp_path / "t")
    blob = {
        "moments": SGPRMoments(var_mean=jnp.arange(4.0), var_chol=jnp.eye(4)),
        "extras": [jnp.ones(2), None, (jnp.zeros(1),)],
    }
    save_pytree(path, blob)
    restored = load_pytree(path)
    assert isinstance(restored["moments"], SGPRMoments)
    np.testing.assert_allclose(restored["moments"].var_mean, np.arange(4.0))
    assert restored["extras"][1] is None
    assert isinstance(restored["extras"][2], tuple)


@pytest.mark.slow
def test_optional_component_restores_into_fresh_wrapper(tmp_path):
    """A checkpoint saved WITH sgpr moments/old must load into a fresh
    wrapper whose moments/old are still None (ADVICE round 1)."""
    from online_gp_tpu.api.sgpr_regression import OnlineSGPRegression

    tx, ty, ex, ey = sin_cos_dataset(n=200)
    ty1, ey1 = ty[:, :1], ey[:, :1]
    w = OnlineSGPRegression(IdentityStem(2), tx[:64], ty1[:64], num_inducing=16)
    w.fit(tx[:64], ty1[:64], num_epochs=5)
    assert w.moments is not None and w.old is not None
    path = str(tmp_path / "sgpr")
    save_wrapper(path, w)

    fresh = OnlineSGPRegression(IdentityStem(2), tx[:64], ty1[:64], num_inducing=16)
    assert fresh.moments is None
    load_wrapper(path, fresh)
    assert fresh.moments is not None and fresh.old is not None
    r0 = w.evaluate(ex, ey1)
    r1 = fresh.evaluate(ex, ey1)
    assert abs(r0[0] - r1[0]) < 1e-7


@pytest.mark.slow
def test_adapter_posterior_fantasize_condition():
    r, (tx, ty, ex, ey) = _fitted()
    adapter = WiskiBayesOptModel(r.model, r.params, r.state)
    post = adapter.posterior(jnp.asarray(ex[:6]), joint=True)
    s = post.sample(jax.random.PRNGKey(0), 9)
    assert s.shape == (9, 2, 6)
    var_from_root = jnp.sum(post.cov_root**2, axis=-1)
    np.testing.assert_allclose(np.asarray(var_from_root), np.asarray(post.variance), rtol=1e-4, atol=1e-6)

    fant = adapter.fantasize(jnp.asarray(ex[:2]), jax.random.PRNGKey(1), num_fantasies=4)
    fpost = fant.posterior(jnp.asarray(ex[:5]))
    assert fpost.mean.shape == (4 * 2, 5)
    assert bool(jnp.isfinite(fpost.mean).all())

    cond = adapter.condition_on_observations(jnp.asarray(ex[:3]), jnp.asarray(ey[:3]))
    assert int(cond.state.num_data) == int(r.state.num_data) + 3
    assert bool(jnp.isfinite(cond.mll()).all())


def test_check_decomposition_and_refresh():
    r, (tx, ty, ex, ey) = _fitted()
    for i in range(200, min(240, len(tx))):
        r.update(tx[i : i + 1], ty[i : i + 1])
    diag = wiski_check_decomposition(r.state)
    assert float(diag["root_recon_rel_err"].max()) < 1e-3
    assert float(diag["inverse_root_err"].max()) < 1e-2
    # refresh rebuilds from the exact Gram accumulator; it bounds long-
    # horizon drift (not guaranteed to beat an already-healthy root)
    refreshed = wiski_refresh_roots(r.state)
    diag2 = wiski_check_decomposition(refreshed)
    assert float(diag2["root_recon_rel_err"].max()) < 1e-3
    assert float(diag2["inverse_root_err"].max()) < 1e-2


def test_orbax_backend_roundtrip(tmp_path):
    """backend='orbax' writes through orbax-checkpoint and loads back
    exemplar-free, including NamedTuple nodes and None components."""
    import jax.numpy as jnp
    from online_gp_tpu.ops.root_update import RootCache
    from online_gp_tpu.utils.checkpoint import load_pytree, save_pytree

    tree = {
        "roots": RootCache(mat=None, root=jnp.eye(3), inv_root=jnp.eye(3)),
        "params": {"a": jnp.arange(4.0), "b": (jnp.ones(2), None)},
    }
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree, backend="orbax")
    restored = load_pytree(path)
    assert isinstance(restored["roots"], RootCache)
    assert restored["roots"].mat is None
    assert restored["params"]["b"][1] is None
    import numpy as np
    np.testing.assert_allclose(np.asarray(restored["roots"].root), np.eye(3))
    np.testing.assert_allclose(np.asarray(restored["params"]["a"]), np.arange(4.0))

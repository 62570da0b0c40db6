"""Fused blocked-Cholesky Pallas kernel vs jnp.linalg.cholesky.

Interpret-mode parity on CPU (the kernel itself is TPU-targeted; the
on-chip timing probe lives in DESIGN.md §3 / scripts). Covers padding
(m not a multiple of the block), batching, and factor-contract details
(zeroed strict upper triangle).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from online_gp_tpu.ops.pallas_chol import blocked_cholesky


def _spd(m, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((m, m)).astype(dtype)
    return a @ a.T / m + np.eye(m, dtype=dtype)


@pytest.mark.parametrize("m,block", [(64, 64), (150, 64), (320, 128)])
def test_matches_dense_cholesky(m, block):
    q = _spd(m)
    got = np.asarray(blocked_cholesky(jnp.asarray(q), block=block, interpret=True))
    want = np.linalg.cholesky(q)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    # strict upper triangle is exactly zero
    assert np.all(got[np.triu_indices(m, k=1)] == 0.0)


def test_batched_and_wiski_shaped():
    """The MLL call site is (B, m, m) with Q = I + PSD (well-conditioned)."""
    qs = np.stack([_spd(200, seed=s) + np.eye(200, dtype=np.float32) for s in range(3)])
    got = np.asarray(blocked_cholesky(jnp.asarray(qs), block=64, interpret=True))
    for b in range(3):
        np.testing.assert_allclose(got[b], np.linalg.cholesky(qs[b]),
                                   atol=2e-5, rtol=1e-4)

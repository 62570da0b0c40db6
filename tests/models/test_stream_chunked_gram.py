"""Bounded-memory bulk absorption (round-3 VERDICT item 5).

The non-slim ``wiski_stream`` used to densify the whole stream's W for
the Gram accumulator (O(n*m) — ~470 MB at n=131k, m=900); it now
accumulates in 2048-point segments, so absorb memory is O(m^2 + seg*m)
regardless of stream length. These tests pin (a) exact equality of the
chunked accumulator against the single-shot densification, and (b) a
long-stream (n > 2*seg) absorb that matches sequential conditioning.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.kernels.base import RBFKernel
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski import (
    WiskiModel,
    wiski_condition,
    wiski_init,
    wiski_stream,
)

DT = jnp.float64


def _setup(grid_size=8):
    grid = Grid.create([(-1.2, 1.2)], grid_size, dtype=DT)
    model = WiskiModel(RBFKernel(), grid, num_outputs=1, learn_additional_noise=True)
    x = jnp.linspace(-1, 1, 16, dtype=DT)[:, None]
    y = jnp.sin(2.5 * x)
    state = wiski_init(model, x, y, jnp.full_like(y, 0.5))
    return model, state


@pytest.mark.slow
def test_long_stream_gram_matches_sequential():
    """n = 4500 > 2*2048 forces the chunked accumulator (with a padded
    final segment); the result must equal point-by-point conditioning's
    add-one-outer-product accumulator to f64 precision."""
    model, state = _setup()
    n = 4500
    key = jax.random.PRNGKey(0)
    xs = jax.random.uniform(key, (n, 1), DT, -1, 1)
    ys = jnp.sin(2.5 * xs)
    ns = jnp.full_like(ys, 0.7)

    bulk = wiski_stream(model, state, xs, ys, ns, block_size=32)

    # sequential oracle on a prefix is O(n) python-loop slow; instead use
    # the one-shot densification formula on the whole stream (the exact
    # math the chunking must reproduce)
    from online_gp_tpu.ops.interp import interp_coeffs, dense_w

    idx, w = interp_coeffs(model.grid, xs, detach=True)
    wt = dense_w(idx, w, model.grid.num_points)  # (m, n)
    expect = state.roots.mat + jnp.einsum(
        "mc,cb,kc->bmk", wt, 1.0 / jnp.maximum(ns, 1e-7), wt
    )
    np.testing.assert_allclose(
        np.asarray(bulk.roots.mat), np.asarray(expect), rtol=1e-12, atol=1e-10
    )
    assert int(bulk.num_data) == 16 + n


def test_chunked_prefix_matches_sequential_conditioning():
    """End-to-end: a (seg-straddling) 2100-point absorb equals sequential
    wiski_condition on every cache, not just the Gram accumulator."""
    model, state = _setup()
    n = 2100  # > seg = 2048 -> chunked path with one padded segment
    key = jax.random.PRNGKey(1)
    xs = jax.random.uniform(key, (n, 1), DT, -1, 1)
    ys = jnp.sin(2.5 * xs)
    ns = jnp.full_like(ys, 0.7)

    bulk = wiski_stream(model, state, xs, ys, ns, block_size=64)

    @jax.jit
    def seq_scan(st, xs, ys, ns):
        def step(s, inp):
            xi, yi, ni = inp
            return wiski_condition(model, s, xi[None], yi[None], ni[None]), 0.0

        out, _ = jax.lax.scan(step, st, (xs, ys, ns))
        return out

    seq = seq_scan(state, xs, ys, ns)
    np.testing.assert_allclose(
        np.asarray(bulk.roots.mat), np.asarray(seq.roots.mat), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(bulk.roots.root), np.asarray(seq.roots.root), atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(bulk.wty), np.asarray(seq.wty), atol=1e-10)
    np.testing.assert_allclose(np.asarray(bulk.ydy), np.asarray(seq.ydy), atol=1e-10)

"""The bench harness's full-update mode (repo-root bench.py): correctness
gates and chunk semantics, on a small grid so CPU CI stays fast."""

import pytest
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")  # repo root: bench.py lives next to the package


def _model(grid_size=8, d=2):
    from online_gp_tpu.kernels import RBFKernel
    from online_gp_tpu.ops import Grid
    from online_gp_tpu.models.wiski import WiskiModel

    grid = Grid.create([(-1.1, 1.1)] * d, grid_size)
    return WiskiModel(RBFKernel(), grid, num_outputs=1,
                      learn_additional_noise=True), grid, d


@pytest.mark.slow
def test_full_update_mode_runs_and_gates():
    import bench

    model, grid, d = _model()
    rate = bench.bench_full_update(model, grid, d)
    assert np.isfinite(rate) and rate > 0


def test_full_update_chunked_mode():
    """chunk>1 amortizes the per-step hyper/caches rebuild: on any
    hardware the per-POINT rate at chunk 8 must beat chunk 1 (same
    semantics as the drivers at batch_size=8)."""
    import bench

    model, grid, d = _model()
    r1 = bench.bench_full_update(model, grid, d, chunk=1)
    r8 = bench.bench_full_update(model, grid, d, chunk=8)
    assert np.isfinite(r8) and r8 > r1

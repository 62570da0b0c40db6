"""One-off timing of wiski_lowrank_init at large n (ADVICE r3 item:
the chunked absorb loop runs ~n/(k_buf-rank) sequential compress cycles
at init — measure the cost and record it in RESULTS.md).

Usage: python scripts/bench_lowrank_init.py [n=50000] [rank=512]
       [grid=40] [kernel_aware=1]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from online_gp_tpu.ops.grid import Grid  # noqa: E402
from online_gp_tpu.kernels.base import make_kernel  # noqa: E402
from online_gp_tpu.models.wiski_lowrank import (  # noqa: E402
    WiskiLowRankModel,
    wiski_lowrank_init,
)


def main():
    kw = dict(n="50000", rank="512", grid="40", kernel_aware="1")
    for a in sys.argv[1:]:
        k, v = a.split("=", 1)
        kw[k] = v
    n, rank, grid_size = int(kw["n"]), int(kw["rank"]), int(kw["grid"])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)
    nv = jnp.full((n, 1), 0.05, jnp.float32)

    grid = Grid.create([(-1.1, 1.1)] * 2, grid_size)
    model = WiskiLowRankModel(make_kernel("rbf"), grid, rank=rank)
    params = model.init_params(2) if kw["kernel_aware"] == "1" else None

    # warm compile (body + tail shapes) on a prefix
    t0 = time.time()
    st = wiski_lowrank_init(model, x[: 2 * rank + 8], y[: 2 * rank + 8],
                            nv[: 2 * rank + 8], params=params)
    jax.block_until_ready(st.root)
    t_compile = time.time() - t0

    t0 = time.time()
    st = wiski_lowrank_init(model, x, y, nv, params=params)
    jax.block_until_ready(st.root)
    t_init = time.time() - t0
    m = grid.num_points
    print(
        f"lowrank init: n={n} rank={rank} k_buf={model.k_buf} m={m} "
        f"kernel_aware={kw['kernel_aware']} -> {t_init:.2f}s "
        f"({n / t_init:,.0f} points/s; warmup+compile {t_compile:.2f}s)"
    )


if __name__ == "__main__":
    main()

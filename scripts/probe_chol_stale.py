"""On-chip probes for two VERDICT r4 items:

(6) blocked-Cholesky wiring decision — time XLA's `jnp.linalg.cholesky`
    vs `ops/pallas_chol.py` on the m=900 `chol(Q)` shape (dependent-chain
    timing, value-forced) and print both rates; wire the Pallas kernel
    into `models/wiski.py::_dense_inner_pieces` only if it wins.

(5) stale-cache arm reconciliation — DESIGN.md predicted ~320 us/point
    (3.1k/s) for `bench_full_update_stale` from standalone component
    timings; BENCH_r04 measured 6,340/s (158 us/point). Hypothesis: the
    standalone 115 us stem-grad and 108 us condition timings are
    dispatch/dependent-chain floors that collapse when both live inside
    one fused scan step. Probe: time the per-point scan body alone
    (stem grad + rank-1 condition, no segment work) and the segment work
    alone; check per_point + segment/8 against the measured 158 us.

    python scripts/probe_chol_stale.py
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_driver_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)



SMOKE = "--smoke" in sys.argv  # tiny CPU-viable shapes, API/syntax check only


def probe_chol(m=900):
    if SMOKE:
        m = 256
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (m, m), dtype=jnp.float32)
    Q = jnp.eye(m) + (A @ A.T) / m  # I + PSD, same conditioning as the MLL's Q

    xla = jax.jit(jnp.linalg.cholesky)
    from online_gp_tpu.ops.pallas_chol import blocked_cholesky
    pal = jax.jit(lambda q: blocked_cholesky(q))

    # parity first
    Lx = xla(Q); Lp = pal(Q)
    err = float(jnp.max(jnp.abs(jnp.tril(Lx) - jnp.tril(Lp))))
    # dependent-chain timing: feed each output back in via a cheap psd remap
    def chain_x(q, n):
        def body(c, _):
            L = jnp.linalg.cholesky(c)
            # remap to a fresh well-conditioned PSD input (cheap, fused)
            return jnp.eye(m) + 0.999 * jnp.tril(L) @ jnp.tril(L).T / m, None
        return jax.lax.scan(body, q, None, length=n)[0]
    def chain_p(q, n):
        def body(c, _):
            L = blocked_cholesky(c)
            return jnp.eye(m) + 0.999 * jnp.tril(L) @ jnp.tril(L).T / m, None
        return jax.lax.scan(body, q, None, length=n)[0]
    n = 4 if SMOKE else 64
    cx = jax.jit(lambda q: chain_x(q, n)); cp = jax.jit(lambda q: chain_p(q, n))
    jax.block_until_ready(cx(Q)); jax.block_until_ready(cp(Q))
    def bench(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(f(Q))
            best = min(best, (time.perf_counter() - t0) / n)
        return best
    # the remap matmul is common to both chains; difference isolates chol
    tx, tp = bench(cx), bench(cp)
    flops = m**3 / 3
    print(json.dumps(dict(
        probe="chol900", parity_maxabs=err,
        xla_us=round(tx * 1e6, 1), pallas_us=round(tp * 1e6, 1),
        note="per-iter times include one shared m^3 remap matmul",
    )), flush=True)
    return tx, tp, err


def probe_stale(refresh_every=8):
    import optax
    from online_gp_tpu.api.stems import LinearStem
    from online_gp_tpu.config import SolverConfig
    from online_gp_tpu.models.partial_mll import sm_partial_mll
    from online_gp_tpu.models.wiski import (
        WiskiModel, wiski_condition, wiski_init, wiski_mll,
        wiski_prediction_caches, wiski_slim,
    )
    from online_gp_tpu.kernels import RBFKernel
    from online_gp_tpu.ops import Grid

    d, grid_size = 2, 30  # the m=900 flagship bench shape (bench.py::main)
    grid = Grid.create([(-1.1, 1.1)] * d, grid_size)
    model = WiskiModel(RBFKernel(), grid, num_outputs=1, learn_additional_noise=True)
    params = model.init_params(d)
    stem = LinearStem(d, d)
    key = jax.random.PRNGKey(0)
    stem_params, bn_state = stem.init(key)
    cfg = SolverConfig(); cfg_skip = cfg.replace(skip_logdet_forward=True)
    kx, ky = jax.random.split(key)
    x0 = jax.random.uniform(kx, (256, d), minval=-1, maxval=1)
    f0, _ = stem.apply(stem_params, bn_state, x0, train=False)
    y0 = jnp.sin(3 * x0[:, :1])
    state = wiski_slim(wiski_init(model, jax.lax.stop_gradient(f0), y0, jnp.ones_like(y0)))
    stem_opt = optax.adam(1e-2); gp_opt = optax.adam(1e-2)
    caches = wiski_prediction_caches(model, params, state, cfg)

    def point_step(carry, inp):
        sp, st_os, state = carry
        x, y = inp
        def stem_loss(sp_):
            feats, _ = stem.apply(sp_, bn_state, x, train=False)
            return -jnp.sum(sm_partial_mll(model, params, state, feats, y, cfg, caches=caches))
        s_loss, s_grads = jax.value_and_grad(stem_loss)(sp)
        s_up, st_os = stem_opt.update(s_grads, st_os, sp)
        sp = optax.apply_updates(sp, s_up)
        feats, _ = stem.apply(sp, bn_state, x, train=False)
        state = wiski_condition(model, state, jax.lax.stop_gradient(feats), y, jnp.ones_like(y))
        return (sp, st_os, state), s_loss

    n = 16 if SMOKE else 512
    xs = jax.random.uniform(ky, (n, 1, d), minval=-1, maxval=1)
    ys = jnp.sin(3 * xs[..., :1])

    @jax.jit
    def run_points(sp, state, xs, ys):
        st_os = stem_opt.init(sp)
        (sp, _, state), losses = jax.lax.scan(point_step, (sp, st_os, state), (xs, ys))
        return sp, state, losses

    sp_out, st_out, losses = run_points(stem_params, state, xs, ys)
    jax.block_until_ready(st_out.num_data)
    assert bool(jnp.isfinite(losses).all())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sp_out, st_out, losses = run_points(stem_params, state, xs, ys)
        jax.block_until_ready(st_out.num_data)
        best = min(best, (time.perf_counter() - t0) / n)
    per_point_us = best * 1e6

    @jax.jit
    def seg(params, state):
        gp_os = gp_opt.init(params)
        def body(c, _):
            p, os_ = c
            caches = wiski_prediction_caches(model, p, state, cfg)
            def gp_loss(pp):
                return -jnp.sum(wiski_mll(model, pp, state, cfg_skip)) + 0.0 * jnp.sum(caches[0])
            g_loss, g = jax.value_and_grad(gp_loss)(p)
            up, os_ = gp_opt.update(g, os_, p)
            return (optax.apply_updates(p, up), os_), g_loss
        (p, _), ls = jax.lax.scan(body, (params, gp_os), None, length=4 if SMOKE else 64)
        return p, ls
    n_seg = 4 if SMOKE else 64
    p_out, ls = seg(params, st_out)
    jax.block_until_ready(ls)
    best_seg = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p_out, ls = seg(params, st_out)
        jax.block_until_ready(ls)
        best_seg = min(best_seg, (time.perf_counter() - t0) / n_seg)
    seg_us = best_seg * 1e6
    pred = per_point_us + seg_us / refresh_every
    print(json.dumps(dict(
        probe="stale_decomp", per_point_us=round(per_point_us, 1),
        segment_us=round(seg_us, 1),
        predicted_stale_us_per_point=round(pred, 1),
        predicted_stale_per_sec=round(1e6 / pred, 1),
        bench_r04_measured_per_sec=6340.2,
    )), flush=True)


if __name__ == "__main__":
    probe_chol()
    probe_stale()

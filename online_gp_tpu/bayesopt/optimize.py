"""Gradient-based acquisition optimization (botorch ``optimize_acqf``
equivalent).

Pattern follows the reference's own candidate generator
(``experiments/active_learning/mpv_osvgp.py:68-95``): reparametrize
candidates into unconstrained space with a log-odds transform, run Adam
with an early-stopping loop — here over many restarts *in parallel*
(vmapped), fully jitted, with `lax.while_loop` for the stopping rule.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def sobol_raw_init(q: int, d: int, raw_samples: int, seed: int) -> jnp.ndarray:
    """Host-side low-discrepancy raw starts for :func:`optimize_acqf`.

    (raw_samples, q, d) in (0.02, 0.98) — scipy Sobol when present (the
    reference's SobolQMCNormalSampler habit), IID uniform otherwise.
    Generated OUTSIDE jit so a jitted acquisition-optimization step can
    take it as a plain traced argument (no per-step retrace)."""
    try:
        from scipy.stats import qmc

        sob = qmc.Sobol(q * d, scramble=True, seed=seed)
        n_pow2 = 1 << max(int(np.ceil(np.log2(max(raw_samples, 1)))), 0)
        raw = np.asarray(sob.random_base2(int(np.log2(n_pow2)))[:raw_samples], np.float32)
    except Exception:
        raw = np.random.default_rng(seed).uniform(size=(raw_samples, q * d)).astype(np.float32)
    return jnp.asarray(0.02 + 0.96 * raw.reshape(raw_samples, q, d))


def optimize_acqf(
    acqf: Callable[[jnp.ndarray], jnp.ndarray],
    bounds: jnp.ndarray,
    q: int,
    num_restarts: int = 10,
    raw_samples: int = 64,
    maxiter: int = 200,
    lr: float = 0.05,
    key=None,
    method: str = "adam",
    raw_init=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Maximize a q-batch acquisition over box bounds.

    Args:
      acqf: (q, d) -> scalar acquisition value (maximized).
      bounds: (d, 2).
      q: candidates per batch.
      method: per-restart ascent — ``"adam"`` (default) or ``"lbfgs"``
        (optax L-BFGS + zoom linesearch in the sigmoid-reparametrized
        space; botorch's ``optimize_acqf`` likewise runs scipy L-BFGS-B
        on its restarts). L-BFGS converges in far fewer steps on smooth
        acquisitions; Adam is more robust on noisy MC acquisitions.
      raw_init: optional (raw_samples, q, d) starts in (0, 1) from
        :func:`sobol_raw_init` — pass it when calling under ``jax.jit``
        (the Sobol generator is host-side); defaults to Sobol/uniform
        generated here.

    Returns:
      best candidates (q, d), best acquisition value.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    d = bounds.shape[0]
    lo, hi = bounds[:, 0], bounds[:, 1]

    def to_x(t):  # unconstrained -> box
        return lo + (hi - lo) * jax.nn.sigmoid(t)

    # initialization heuristic: score raw samples, take the best as starts.
    k1, k2 = jax.random.split(key)
    if raw_init is not None:
        raw = raw_init
    elif isinstance(key, jax.core.Tracer):
        # under jit without explicit starts: host Sobol is unavailable
        raw = jax.random.uniform(k1, (raw_samples, q, d), minval=0.02, maxval=0.98)
    else:
        raw = sobol_raw_init(
            q, d, raw_samples, int(jax.random.randint(k1, (), 0, 2**31 - 1))
        )
    raw_x = lo + (hi - lo) * raw
    raw_vals = jax.vmap(acqf)(raw_x)
    top = jnp.argsort(-raw_vals)[:num_restarts]
    starts = jnp.log(raw[top] / (1.0 - raw[top]))  # logit init

    if method not in ("adam", "lbfgs"):
        raise ValueError(f"unknown method {method!r} (adam/lbfgs)")
    opt = optax.adam(lr) if method == "adam" else optax.lbfgs()

    # pin the carry scalar dtype to the acquisition's output dtype (under
    # x64 mode python -inf literals would otherwise promote and break the
    # while_loop carry typing)
    val_dtype = jax.eval_shape(lambda t: acqf(to_x(t)), starts[0]).dtype
    neg_inf = jnp.asarray(-jnp.inf, val_dtype)
    # L-BFGS minimizes; its linesearch caches (value, grad) in the params'
    # dtype — keep the internal loss in that dtype (see make_fit_fn)
    t_dtype = starts.dtype

    def restart_opt(t0):
        def loss_fn(tt):
            return (-acqf(to_x(tt))).astype(t_dtype)

        def cond(carry):
            t, os_, it, last, cur, best_t, best_val = carry
            return jnp.logical_and(it < maxiter, jnp.logical_or(it < 5, cur > last + 1e-9))

        def body(carry):
            t, os_, it, last, cur, best_t, best_val = carry
            if method == "lbfgs":
                loss, g = optax.value_and_grad_from_state(loss_fn)(t, state=os_)
                val = (-loss).astype(val_dtype)
            else:
                val, g_up = jax.value_and_grad(lambda tt: acqf(to_x(tt)))(t)
                val = val.astype(val_dtype)
            better = val > best_val
            best_t = jax.tree.map(lambda a, b: jnp.where(better, a, b), t, best_t)
            best_val = jnp.where(better, val, best_val)
            if method == "lbfgs":
                up, os_ = opt.update(g, os_, t, value=loss, grad=g, value_fn=loss_fn)
            else:
                up, os_ = opt.update(jax.tree.map(jnp.negative, g_up), os_)
            t = optax.apply_updates(t, up)
            return (t, os_, it + 1, cur, val, best_t, best_val)

        carry = (t0, opt.init(t0), jnp.asarray(0), neg_inf, neg_inf, t0, neg_inf)
        *_, best_t, best_val = jax.lax.while_loop(cond, body, carry)
        return to_x(best_t), best_val

    xs, vals = jax.vmap(restart_opt)(starts)
    best = jnp.argmax(vals)
    return xs[best], vals[best]

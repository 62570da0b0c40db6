"""Toeplitz matrix-vector products via FFT circulant embedding.

On a uniform 1-D grid every stationary kernel produces a symmetric
Toeplitz Gram matrix; the reference toggles this structure with gpytorch's
``use_toeplitz`` flag (``experiments/bayesopt/bayesopt.py:282``,
``experiments/fixed_noise_regression/wiski_regression.py:94``). TPU-native
equivalent: embed the m×m symmetric Toeplitz matrix in a 2m-circulant and
apply it with two real FFTs — O(m log m) and fully batched.
"""

from __future__ import annotations

import jax.numpy as jnp


def toeplitz_mvm(col: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Symmetric-Toeplitz MVM.

    Args:
      col: (..., m) first column of the symmetric Toeplitz matrix.
      x: (..., m, k) right-hand sides.

    Returns:
      (..., m, k) = T @ x.
    """
    m = col.shape[-1]
    # circulant embedding: [c_0, c_1, .., c_{m-1}, 0, c_{m-1}, .., c_1]
    emb = jnp.concatenate(
        [col, jnp.zeros_like(col[..., :1]), jnp.flip(col[..., 1:], axis=-1)], axis=-1
    )  # (..., 2m)
    f_emb = jnp.fft.rfft(emb, axis=-1)  # (..., m+1)
    x_pad = jnp.concatenate([x, jnp.zeros_like(x)], axis=-2)  # (..., 2m, k)
    f_x = jnp.fft.rfft(x_pad, axis=-2)  # (..., m+1, k)
    prod = f_emb[..., :, None] * f_x
    full = jnp.fft.irfft(prod, n=2 * m, axis=-2)
    return full[..., :m, :].astype(x.dtype)


def sym_toeplitz_dense(col: jnp.ndarray) -> jnp.ndarray:
    """Materialize the symmetric Toeplitz matrix from its first column."""
    m = col.shape[-1]
    i = jnp.arange(m)
    idx = jnp.abs(i[:, None] - i[None, :])
    return col[..., idx]

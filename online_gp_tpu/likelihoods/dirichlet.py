"""Dirichlet-based GP classification transform.

The reference's ``DirichletGPClassifier._transform_targets``
(``online_gp/models/gp_dirichlet_classification.py:15-21``), after
Milios et al. 2018 "Dirichlet-based Gaussian Processes for Large-scale
Calibrated Classification": labels become per-class regression targets
with per-class heteroscedastic noise, so a fixed-noise (WISKI) regressor
does calibrated classification.

    alpha    = alpha_eps + onehot(y)
    sigma2_i = log(1/alpha + 1)
    y_tilde  = log(alpha) - sigma2_i / 2
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def dirichlet_transform(
    labels: jnp.ndarray, num_classes: int, alpha_eps: float = 0.01, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Transform integer labels to regression targets + noise.

    Args:
      labels: (n,) int class labels in [0, num_classes).

    Returns:
      targets (n, C), alpha (n, C), sigma2 (n, C).
    """
    onehot = jnp.eye(num_classes, dtype=dtype)[labels]
    alpha = alpha_eps + onehot
    sigma2 = jnp.log(1.0 / alpha + 1.0)
    targets = jnp.log(alpha) - 0.5 * sigma2
    return targets, alpha, sigma2

"""Static solver configuration.

The reference threads numerics flags through global gpytorch context
managers (``gpytorch.settings.fast_pred_var`` etc.; see
reference ``experiments/regression.py:146-150`` and the repo's own flags in
``online_gp/settings.py``). Under JAX those flags select *compile-time*
branches, so they live in one frozen dataclass passed as a static argument
to jitted functions.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Compile-time numerics switches for the structured GP solvers.

    Mirrors of the reference's gpytorch settings (file:line cites are into
    /root/reference):

    - ``max_cholesky_size``: use dense Cholesky for systems up to this size,
      iterative (CG/Lanczos) above it (``config/regression.yaml:26``).
    - ``max_root_decomposition_size``: Lanczos rank cap for root
      decompositions (``config/regression.yaml:25``).
    - ``cg_tolerance`` / ``max_cg_iterations``: batched-CG controls
      (``config/regression.yaml:27``).
    - ``cholesky_jitter``: diagonal jitter added before Cholesky; escalated
      on failure (gpytorch ``psd_safe_cholesky`` semantics).
    - ``fast_pred_var``: LOVE-style low-rank predictive covariance root
      instead of a dense solve (``batched_fixed_noise_online_gp.py:393-397``).
    - ``fast_pred_samples``: root-decomposed predictive covariance for
      cheap joint sampling (``batched_fixed_noise_online_gp.py:229-243``).
    - ``skip_posterior_variances``: prediction returns mean only
      (``batched_fixed_noise_online_gp.py:245-246``).
    - ``skip_logdet_forward``: drop the log|Q| term from the training MLL
      (used in the online GP hyper step, ``online_ski_regression.py:137``).
    - ``detach_interp_coeff``: stop gradients through the SKI interpolation
      weights (``online_gp/settings.py``; applied at evaluation points in
      the online loops).
    - ``use_toeplitz``: exploit Toeplitz structure of per-dim grid kernels
      (FFT MVMs) instead of dense factors (``experiments/bayesopt/bayesopt.py:282``).
    - ``grid_shard_axis``: mesh axis name over which the inducing-grid
      dimension m is sharded (tensor parallelism for very large grids; no
      reference analog — it has no distributed backend, SURVEY §2.14).
      When set, the WISKI solvers pin their m-row-sharded layout on the
      big m x m intermediates with sharding constraints so GSPMD keeps the
      contraction collectives (psum over the m-shards) instead of
      all-gathering the operands. Callers must run inside the matching
      ``Mesh`` context.
    """

    max_cholesky_size: int = 2048
    max_root_decomposition_size: int = 512
    cg_tolerance: float = 1e-2
    max_cg_iterations: int = 256
    cholesky_jitter: float = 1e-6
    max_cholesky_jitter_tries: int = 5
    fast_pred_var: bool = False
    fast_pred_samples: bool = False
    skip_posterior_variances: bool = False
    skip_logdet_forward: bool = False
    detach_interp_coeff: bool = False
    use_toeplitz: bool = False
    grid_shard_axis: "str | None" = None

    def replace(self, **kwargs) -> "SolverConfig":
        return dataclasses.replace(self, **kwargs)


DEFAULT_CONFIG = SolverConfig()

"""online_gp_tpu — TPU-native streaming Gaussian processes (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of ``wjmaddox/online_gp``
(WISKI — "Kernel Interpolation for Scalable Online Gaussian Processes",
arXiv:2103.01454) for TPU hardware:

- functional core: every GP is an immutable pytree state + pure jittable
  ``init / condition / mll / predict`` functions (streams run under
  ``lax.scan``; hyper-learning is optax),
- structured linear algebra (SKI interpolation, Toeplitz/Kronecker grid
  kernels, CG/Lanczos, maintained matrix roots) implemented as
  MXU-friendly batched dense ops with Pallas kernels on the hot paths,
- explicit ``SolverConfig`` dataclass instead of global mutable settings
  contexts (flags gate *compile-time* branches under jit),
- multi-chip scaling via ``jax.sharding`` meshes over the output/fantasy
  batch dimension (see ``online_gp_tpu.parallel``).

Reference layer map: /root/reference per SURVEY.md. This package is a new
TPU-first design, not a port.
"""

from online_gp_tpu.config import SolverConfig

__version__ = "0.1.0"

__all__ = ["SolverConfig", "__version__"]

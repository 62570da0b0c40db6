"""Structured linear-algebra and interpolation ops (the [KERNEL] layer).

This package replaces the GPyTorch LazyTensor stack the reference leans on
(SURVEY.md §2.9): SKI cubic interpolation, Toeplitz/Kronecker grid-kernel
MVMs, psd-safe Cholesky, batched CG, Lanczos, and the maintained-root
rank-q update at the heart of WISKI's constant-time conditioning.
"""

from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.ops.interp import (
    interp_coeffs,
    interp_matvec,
    dense_w,
    gather_predict,
)
from online_gp_tpu.ops.chol import psd_safe_cholesky, cho_solve, tri_solve
from online_gp_tpu.ops.root_update import RootCache, root_cache_init, root_cache_update
from online_gp_tpu.ops.kron import kron_mvm, kron_dense
from online_gp_tpu.ops.toeplitz import toeplitz_mvm

__all__ = [
    "Grid",
    "interp_coeffs",
    "interp_matvec",
    "dense_w",
    "gather_predict",
    "psd_safe_cholesky",
    "cho_solve",
    "tri_solve",
    "RootCache",
    "root_cache_init",
    "root_cache_update",
    "kron_mvm",
    "kron_dense",
    "toeplitz_mvm",
]

"""Matmul-precision guard for dense GP math on TPU.

TPU MXU matmuls default to bfloat16 inputs; the dense solve chains in the
baseline models (Cholesky of kernel Gram matrices, triangular solves in
ELBO/KL/moment recursions) lose enough mantissa under bf16 that a
borderline-PSD Gram goes indefinite and the factorization NaNs — observed
as non-finite params after the first streaming O-SVGP update on a real
chip while the identical f32 program is healthy on CPU. The structured
WISKI path already pins its matmuls (`ops/root_update.py:83` etc.); this
decorator applies the same policy to whole model-level functions.

Tracing happens inside the wrapped call, so the context manager pins the
precision of every dot captured by jit from the function body, including
nested helpers.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["f32_matmuls"]


def f32_matmuls(fn):
    """Trace ``fn`` with float32 matmul precision (TPU: fp32-accurate MXU
    passes instead of the bf16 default)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped

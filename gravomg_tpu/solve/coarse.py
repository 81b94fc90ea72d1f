"""Coarsest-level direct solve: dense Cholesky on chip.

BASELINE.json: "The coarsest level falls back to a dense Cholesky solve
on-chip."  The coarsest operator is a few hundred vertices, so the dense
factor lives comfortably in VMEM and the triangular solves are small
MXU-friendly batched ops.  A small diagonal shift keeps semi-definite
operators (pure Neumann Laplacians) factorizable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gravomg_tpu.types import EllOperator


def factor_coarse(op: EllOperator, shift_scale: float = 1e-10) -> jax.Array:
    """Cholesky factor (lower) of the densified coarsest operator."""
    a = op.as_dense()
    shift = shift_scale * jnp.max(jnp.abs(op.diag))
    a = a + shift * jnp.eye(a.shape[0], dtype=a.dtype)
    return jnp.linalg.cholesky(a)


def coarse_solve(chol: jax.Array, b: jax.Array) -> jax.Array:
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)

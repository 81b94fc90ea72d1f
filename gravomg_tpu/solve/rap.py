"""Galerkin coarse-operator assembly: A_c = U^T A U.

Not present in the reference fork (SURVEY.md §0, CS-5); required by
BASELINE.json.  Exploits U's <=3 nnz/row invariant
(`src/multigrid.cpp:265-498`): every fine vertex i contributes
  diag:     A_ii * U[i,a] * U[i,b]           (3x3 pairs)
  offdiag:  A_ij * U[i,a] * U[j,b]           (K * 3x3 pairs)
to A_c[col_a, col_b].  All contributions are emitted as one flat triplet
stream and merged with a single sort-based scatter (ops/segment.py) --
the one-shot TPU replacement for incremental sparse insertion.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gravomg_tpu.types import EllOperator, Prolongation, INVALID_INDEX
from gravomg_tpu.ops.segment import build_ell_rows


@functools.partial(jax.jit, static_argnames=("max_degree",))
def galerkin_rap(op: EllOperator, u: Prolongation,
                 max_degree: int) -> Tuple[EllOperator, jax.Array]:
    """Compute A_c = U^T A U as an ELL operator with static max_degree.

    Returns (A_c, overflow flag).
    """
    vf, k = op.neighbors.shape
    nc = u.n_coarse
    safe = op.safe_neighbors()
    a_off = jnp.where(op.mask, op.offdiag, 0.0)

    uc = u.cols                                   # (Vf, 3)
    uw = u.weights                                # (Vf, 3)
    uc_j = uc[safe]                               # (Vf, K, 3)
    uw_j = uw[safe]                               # (Vf, K, 3)

    # Off-diagonal contributions: (Vf, K, 3, 3)
    rows_off = jnp.broadcast_to(uc[:, None, :, None], (vf, k, 3, 3))
    cols_off = jnp.broadcast_to(uc_j[:, :, None, :], (vf, k, 3, 3))
    vals_off = (a_off[:, :, None, None]
                * uw[:, None, :, None] * uw_j[:, :, None, :])
    valid_off = jnp.broadcast_to(op.mask[:, :, None, None], (vf, k, 3, 3))

    # Diagonal contributions: (Vf, 3, 3)
    rows_d = jnp.broadcast_to(uc[:, :, None], (vf, 3, 3))
    cols_d = jnp.broadcast_to(uc[:, None, :], (vf, 3, 3))
    vals_d = op.diag[:, None, None] * uw[:, :, None] * uw[:, None, :]

    rows = jnp.concatenate([rows_off.reshape(-1), rows_d.reshape(-1)])
    cols = jnp.concatenate([cols_off.reshape(-1), cols_d.reshape(-1)])
    vals = jnp.concatenate([vals_off.reshape(-1), vals_d.reshape(-1)])
    valid = jnp.concatenate([valid_off.reshape(-1),
                             jnp.ones(vf * 9, bool)])

    res = build_ell_rows(rows, cols, valid, nc, max_degree + 1,
                         values=vals, combine="add")
    # Split out the diagonal (stored like any entry by the scatter).
    cmask = res.columns != INVALID_INDEX
    is_diag = cmask & (res.columns == jnp.arange(nc, dtype=jnp.int32)[:, None])
    diag = jnp.sum(jnp.where(is_diag, res.values, 0.0), axis=1)
    off_cols = jnp.where(is_diag, INVALID_INDEX, res.columns)
    off_vals = jnp.where(is_diag, 0.0, res.values)
    # Re-compact rows so valid off-diagonals form a sorted prefix again.
    order = jnp.argsort(off_cols, axis=1, stable=True)
    off_cols = jnp.take_along_axis(off_cols, order, axis=1)
    off_vals = jnp.take_along_axis(off_vals, order, axis=1)
    off_cols = off_cols[:, :max_degree]
    off_vals = off_vals[:, :max_degree]
    # Bucket-phantom coarse rows receive no contributions (their U
    # columns are never referenced); give them identity diagonals so
    # smoothers and the coarse Cholesky stay well-posed.  A genuinely
    # zero diagonal cannot occur for an SPD fine operator with nonzero
    # U rows.
    diag = jnp.where(diag == 0.0, 1.0, diag)
    return (EllOperator(neighbors=off_cols, offdiag=off_vals, diag=diag),
            res.overflow)

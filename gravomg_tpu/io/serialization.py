"""Hierarchy serialization (checkpoint / resume, SURVEY.md §5).

The reference has no persistence; the hierarchy (per level: coarse graph,
parents, prolongation, Galerkin operator) is the natural serializable
artifact enabling reused-hierarchy workloads (BASELINE.json config 3:
successive RHS solves on the armadillo).  Stored as a flat .npz; loads
back into the solver pytree with no recomputation.
"""

from __future__ import annotations

import io
from typing import Optional

import numpy as np
import jax.numpy as jnp

from gravomg_tpu.config import MultigridConfig
from gravomg_tpu.types import EllOperator, Graph, Prolongation
from gravomg_tpu.solve.smoothers import ChebyshevParams
from gravomg_tpu.solve.vcycle import SolverHierarchy, SolverLevel


def save_solver(path: str, h: SolverHierarchy) -> None:
    arrays = {"n_levels": np.int64(len(h.levels)),
              "coarse_chol": np.asarray(h.coarse_chol)}
    for i, lvl in enumerate(h.levels):
        arrays[f"l{i}_nbr"] = np.asarray(lvl.op.neighbors)
        arrays[f"l{i}_off"] = np.asarray(lvl.op.offdiag)
        arrays[f"l{i}_diag"] = np.asarray(lvl.op.diag)
        if lvl.u is not None:
            arrays[f"l{i}_ucols"] = np.asarray(lvl.u.cols)
            arrays[f"l{i}_uw"] = np.asarray(lvl.u.weights)
            arrays[f"l{i}_unc"] = np.int64(lvl.u.n_coarse)
        if lvl.cheb is not None:
            arrays[f"l{i}_cheb"] = np.array(
                [float(lvl.cheb.lam_min), float(lvl.cheb.lam_max)])
    np.savez_compressed(path, **arrays)


def load_solver(path: str) -> SolverHierarchy:
    z = np.load(path)
    n = int(z["n_levels"])
    levels = []
    for i in range(n):
        op = EllOperator(jnp.asarray(z[f"l{i}_nbr"]),
                         jnp.asarray(z[f"l{i}_off"]),
                         jnp.asarray(z[f"l{i}_diag"]))
        u = None
        if f"l{i}_ucols" in z:
            u = Prolongation(jnp.asarray(z[f"l{i}_ucols"]),
                             jnp.asarray(z[f"l{i}_uw"]),
                             int(z[f"l{i}_unc"]))
        cheb = None
        if f"l{i}_cheb" in z:
            lo, hi = z[f"l{i}_cheb"]
            cheb = ChebyshevParams(jnp.asarray(lo), jnp.asarray(hi))
        levels.append(SolverLevel(op=op, u=u, cheb=cheb))
    from gravomg_tpu.solve.vcycle import attach_restrictions
    # The gather-form U^T tables are derived data; recompute on load
    # rather than storing the transpose redundantly.
    return attach_restrictions(
        SolverHierarchy(levels=tuple(levels),
                        coarse_chol=jnp.asarray(z["coarse_chol"])))

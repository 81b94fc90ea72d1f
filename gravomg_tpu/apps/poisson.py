"""Poisson-type solves on meshes / point clouds (BASELINE configs 1-2).

The reference's demo problem family: Laplacian systems over kNN point
clouds (`test/main.cpp:68`).  These helpers assemble the operator,
build the hierarchy, and solve with V-cycles or MG-PCG.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gravomg_tpu.config import MultigridConfig
from gravomg_tpu.types import EllOperator, Graph
from gravomg_tpu.geometry.laplacian import cotan_laplacian, graph_laplacian
from gravomg_tpu.hierarchy import Hierarchy, build_hierarchy
from gravomg_tpu.solve.vcycle import solve, solve_refined
from gravomg_tpu.solve.cg import mg_pcg


def screened_poisson_operator(graph: Graph, alpha=0.5,
                              weighting: str = "invdist",
                              rel_floor: float = 1e-4,
                              lap_mass: Optional[Tuple] = None,
                              ) -> Tuple[EllOperator, jax.Array]:
    """A = L + alpha * diag(mass): SPD screened-Poisson operator.

    **f32 representability.**  With "invdist" weights L's diagonal grows
    like 1/h while the lumped mass shrinks like h^2, so a FIXED alpha
    makes the screening term vanish RELATIVE to the diagonal as density
    grows (measured at 1M points: shift/diag ~ 1e-10, far below f32
    eps).  The stored operator is then a singular Laplacian plus
    sign-random rounding noise; Galerkin coarse operators go indefinite
    and V-cycles stall.  ``alpha="auto"`` (recommended at scale) sets
    alpha so the mean screening shift is ``rel_floor`` of the mean
    diagonal -- physically a screened Poisson whose screening length
    tracks the mesh, numerically SPD by a margin ~1e2 above f32 RAP
    noise at every level.  Stays traced (no host sync).

    ``lap_mass``: optional precomputed ``(lap, mass)`` pair to avoid
    re-assembling the Laplacian (large clouds, repeated callers).
    """
    lap, mass = (lap_mass if lap_mass is not None
                 else graph_laplacian(graph, weighting))
    if isinstance(alpha, str):
        if alpha != "auto":
            raise ValueError(f"unknown alpha mode {alpha!r}")
        alpha = rel_floor * jnp.mean(lap.diag) / jnp.mean(mass)
    return lap._replace(diag=lap.diag + alpha * mass), mass


def poisson_hierarchy(graph: Graph, alpha: float = 0.5,
                      cfg: MultigridConfig = MultigridConfig(),
                      lap_mass: Optional[Tuple] = None) -> Hierarchy:
    op, _ = screened_poisson_operator(graph, alpha, lap_mass=lap_mass)
    return build_hierarchy(graph, op, cfg)


def solve_poisson(h: Hierarchy, b: jax.Array,
                  cfg: MultigridConfig = MultigridConfig(),
                  method: str = "pcg", refined: bool = False):
    """Solve A x = b on the hierarchy's finest level.

    method: "pcg" (MG-preconditioned CG, the 1e-8 path at f32) or
    "vcycle" (stationary cycles; f32 stationary iteration stalls around
    1e-5 relative residual, use refined=True to push further).
    refined=True wraps f32 cycles in f64 iterative refinement (needed to
    certify 1e-8 relative residuals with f32 kernels).
    """
    if refined:
        return solve_refined(h.solver, b, cfg)
    if method == "pcg":
        return mg_pcg(h.solver, b, cfg)
    return solve(h.solver, b, cfg)

"""Implicit Laplacian mesh smoothing and spectral-style flows
(BASELINE configs 3 and 5).

Implicit (backward-Euler) mean-curvature-flavored smoothing:
    (M + t L) V_new = M V_old
solved per coordinate with the multigrid hierarchy; repeated steps reuse
the hierarchy and the refit operators (the config-5 time-stepping
pattern, vmappable over a batch of meshes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gravomg_tpu.config import MultigridConfig
from gravomg_tpu.types import Graph
from gravomg_tpu.geometry.laplacian import graph_laplacian
from gravomg_tpu.hierarchy import Hierarchy
from gravomg_tpu.apps.heat import refit_hierarchy
from gravomg_tpu.solve.vcycle import solve


def implicit_smooth(graph: Graph, h: Hierarchy, t_factor: float = 1.0,
                    steps: int = 1,
                    cfg: MultigridConfig = MultigridConfig()) -> jax.Array:
    """Return smoothed vertex positions after ``steps`` implicit steps."""
    lap, mass = graph_laplacian(graph, "invdist")
    mean_edge = jnp.sum(jnp.where(graph.mask, graph.distances, 0.0)) \
        / jnp.sum(graph.mask)
    t = t_factor * mean_edge ** 2
    op = lap._replace(diag=lap.diag * t + mass, offdiag=lap.offdiag * t)
    sh = refit_hierarchy(h, op, cfg)

    pts = graph.points
    for _ in range(steps):
        # Multi-RHS solve: all three coordinates in one V-cycle sweep
        # (SpMV, smoothers, transfers and the coarse solve all accept
        # (V, D) right-hand sides).
        pts, _, _ = solve(sh, mass[:, None] * pts, cfg)
    return pts

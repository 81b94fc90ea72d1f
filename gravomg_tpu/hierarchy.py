"""End-to-end hierarchy construction (reference CS-1, `test/main.cpp:47-186`).

Staged host-side orchestration of the jitted stages: coarse counts are
data-dependent, so between levels we sync sizes to the host, pick padded
static shapes, and let every stage trace once per shape bucket
(SURVEY.md §7).  Padding guesses that overflow are doubled and retried --
each retry is a new static shape, so the common path compiles once.

Pipeline per level (mirrors `test/main.cpp:68-156`):
  radius from mean edge length  (C5, `src/multigrid.cpp:127-133`)
  fast disc sampling            (C4, `src/sampling.cpp:7-53`)
  parent assignment             (C6, `src/multigrid.cpp:77-125`)
  coarse edge extraction        (C7, `src/multigrid.cpp:135-169`)
  coarse point placement        (C8, `src/multigrid.cpp:171-207`)
  Voronoi triangles             (C9, `src/multigrid.cpp:209-263`)
  prolongation                  (C12, `src/multigrid.cpp:265-498`)
  Galerkin RAP                  (solver-side, BASELINE.json)
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gravomg_tpu.config import MultigridConfig
from gravomg_tpu.types import (EllOperator, Graph, HierarchyStats,
                               Prolongation, TriangleSet)
from gravomg_tpu.coarsen.sampling import (fast_disc_sample,
                                          fast_disc_sample_mask,
                                          sampling_radius)
from gravomg_tpu.coarsen.parents import assign_parents
from gravomg_tpu.coarsen.graph import coarse_graph, extract_coarse_edges
from gravomg_tpu.coarsen.placement import coarse_from_mean_of_fine_children
from gravomg_tpu.prolong.triangles import construct_voronoi_triangles
from gravomg_tpu.prolong.operator import construct_prolongation
from gravomg_tpu.solve.rap import galerkin_rap
from gravomg_tpu.solve.coarse import factor_coarse
from gravomg_tpu.solve.smoothers import ChebyshevParams
from gravomg_tpu.solve.vcycle import SolverHierarchy, SolverLevel


def _round_up(x: int, m: int = 8) -> int:
    return ((x + m - 1) // m) * m


def size_bucket(n: int, base: int = 64, ratio: float = 1.25) -> int:
    """Geometric shape bucket (SURVEY.md §7: per-level padded buckets so
    jit compiles once per bucket, not once per mesh).  Coarse levels are
    padded to the bucket with *phantom* vertices: no graph edges, no
    children, identity rows in the Galerkin operator."""
    b = base
    while b < n:
        b = _round_up(int(b * ratio) + 1, base)
    return b


class LevelData(NamedTuple):
    """Full record of one coarsening step (fine -> coarse)."""
    samples: np.ndarray          # (C,) fine ids of coarse seeds
    parents: jax.Array           # (Vf,)
    coarse: Graph                # coarse-level graph
    u: Prolongation
    stats: HierarchyStats


def coarsen_once(graph: Graph, cfg: MultigridConfig,
                 scheme: Optional[int] = None,
                 n_valid_fine: Optional[int] = None) -> Optional[LevelData]:
    """One full coarsening step.  Returns None if the graph no longer
    coarsens (fewer than 8 coarse points).

    The coarse level is padded to a geometric size bucket with phantom
    vertices (empty graph rows; never parents; position 0; zero U rows)
    so that all per-level jitted stages compile once per bucket.
    ``n_valid_fine`` marks the real prefix of an already-padded fine
    graph: phantom fine vertices are never sampled (they are isolated,
    so the greedy would otherwise select every one), never contribute
    children, and get zero prolongation rows.  ``stats.n_coarse``
    records the real count.
    """
    from gravomg_tpu.types import INVALID_INDEX

    scheme = cfg.weighting if scheme is None else scheme
    if n_valid_fine is None:
        n_valid_fine = graph.num_vertices
    radius = sampling_radius(graph, cfg.reduction_ratio)
    sel_mask = np.asarray(fast_disc_sample_mask(graph, radius))
    samples = np.nonzero(sel_mask[:n_valid_fine])[0].astype(np.int32)
    n_real = int(samples.shape[0])
    if n_real < 8 or n_real >= n_valid_fine:
        return None
    n_coarse = min(size_bucket(n_real), graph.num_vertices)
    samples_pad = np.full(n_coarse, INVALID_INDEX, np.int32)
    samples_pad[:n_real] = samples
    samples_j = jnp.asarray(samples_pad)
    parents, _ = assign_parents(graph, samples_j)

    # Coarse adjacency with doubling retry on pad overflow, then sliced
    # down to the actual max degree (rounded to a small bucket): padded
    # K would otherwise compound across levels and blow up the K^2/K^3
    # costs of triangle enumeration and prolongation.
    kc = _round_up(min(2 * graph.max_degree, max(n_real - 1, 8)))
    while True:
        columns, overflow = extract_coarse_edges(graph, parents, n_coarse, kc)
        if not bool(overflow) or kc >= n_real - 1:
            break
        kc = min(_round_up(2 * kc), _round_up(n_real - 1))
    from gravomg_tpu.types import INVALID_INDEX as _INV
    actual_kc = int(jnp.max(jnp.sum(columns != _INV, axis=1)))
    kc_tight = min(_round_up(max(actual_kc, 4), cfg.degree_multiple), kc)
    columns = columns[:, :kc_tight]
    kc = kc_tight

    coarse_points = coarse_from_mean_of_fine_children(
        graph, parents, samples_j, n_valid_fine=n_valid_fine)
    cg = coarse_graph(columns, coarse_points)

    t_max = _round_up(4 * n_coarse, 64)
    a_max = _round_up(4 * kc)
    while True:
        triangles, overflow = construct_voronoi_triangles(cg, t_max, a_max)
        if not bool(overflow):
            break
        t_max = _round_up(2 * t_max, 64)
        a_max = _round_up(2 * a_max)

    u, counts, p_ovf = construct_prolongation(
        graph.points, parents, coarse_points, cg.neighbors, triangles,
        scheme=scheme)
    if n_valid_fine < graph.num_vertices:
        fine_ok = jnp.arange(graph.num_vertices) < n_valid_fine
        u = u._replace(cols=jnp.where(fine_ok[:, None], u.cols, 0),
                       weights=jnp.where(fine_ok[:, None], u.weights, 0.0))
    stats = HierarchyStats(
        n_fine=n_valid_fine, n_coarse=n_real,
        n_triangles=jnp.sum(triangles.mask),
        triangle_hits=counts[0], edge_fallbacks=counts[1],
        point_fallbacks=counts[2], radius=radius)
    return LevelData(samples=samples_pad, parents=parents, coarse=cg, u=u,
                     stats=stats)


class Hierarchy(NamedTuple):
    """Geometric hierarchy + solver-ready operator stack."""
    graphs: Tuple[Graph, ...]            # per level, finest first
    levels: Tuple[LevelData, ...]        # len == len(graphs) - 1
    solver: SolverHierarchy


class DegenerateHierarchyError(RuntimeError):
    """Raised when a level's prolongation is dominated by point
    fallbacks.  Replaces the reference's crash-guard
    ``assert(fallbackCount / n_fine < 0.5)`` (`src/multigrid.cpp:488`)
    with a checked, diagnosable error (SURVEY.md §5)."""


def build_hierarchy(graph: Graph, fine_op: EllOperator,
                    cfg: MultigridConfig = MultigridConfig(),
                    validate: bool = True) -> Hierarchy:
    """Build the full multilevel hierarchy from a fine graph + operator."""
    graphs: List[Graph] = [graph]
    level_data: List[LevelData] = []
    ops: List[EllOperator] = [fine_op]

    g = graph
    op = fine_op
    n_real = graph.num_vertices
    for _ in range(cfg.max_levels - 1):
        if n_real <= cfg.coarse_threshold:
            break
        ld = coarsen_once(g, cfg, n_valid_fine=n_real)
        if ld is None:
            break
        if validate:
            frac = float(ld.stats.point_fallbacks) / max(
                int(ld.stats.n_fine), 1)
            if frac >= 0.5:
                raise DegenerateHierarchyError(
                    f"level {len(level_data)}: {frac:.0%} of fine points "
                    f"used the nearest-point fallback "
                    f"(stats: {ld.stats!r}); the coarse graph is too "
                    f"disconnected for barycentric prolongation")
        kc2 = _round_up(2 * max(ld.coarse.max_degree, op.max_degree))
        while True:
            coarse_op, overflow = galerkin_rap(op, ld.u, kc2)
            if not bool(overflow) or kc2 >= ld.coarse.num_vertices:
                break
            kc2 = min(_round_up(2 * kc2),
                      _round_up(ld.coarse.num_vertices))
        # Slice the operator down to its actual max degree bucket
        # (valid entries are an ascending prefix per row).
        from gravomg_tpu.types import INVALID_INDEX as _INV
        actual = int(jnp.max(jnp.sum(coarse_op.neighbors != _INV, axis=1)))
        kt = min(_round_up(max(actual, 4), cfg.degree_multiple), kc2)
        coarse_op = coarse_op._replace(
            neighbors=coarse_op.neighbors[:, :kt],
            offdiag=coarse_op.offdiag[:, :kt])
        level_data.append(ld)
        graphs.append(ld.coarse)
        ops.append(coarse_op)
        g = ld.coarse
        op = coarse_op
        n_real = int(ld.stats.n_coarse)

    solver_levels = []
    for i, o in enumerate(ops):
        u = level_data[i].u if i < len(level_data) else None
        cheb = (ChebyshevParams.from_operator(o, cfg.chebyshev_ratio)
                if cfg.smoother == "chebyshev" else None)
        solver_levels.append(SolverLevel(op=o, u=u, cheb=cheb))
    chol = factor_coarse(ops[-1])
    from gravomg_tpu.solve.vcycle import attach_restrictions
    solver = attach_restrictions(
        SolverHierarchy(levels=tuple(solver_levels), coarse_chol=chol))
    return Hierarchy(graphs=tuple(graphs), levels=tuple(level_data),
                     solver=solver)

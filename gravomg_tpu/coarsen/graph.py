"""Coarse-graph extraction from the fine graph + parent partition.

Reference C7 ``extractCoarseEdges`` (`src/multigrid.cpp:135-169`): every
fine edge whose endpoints have different parents induces a coarse edge
between those parents.  The reference's stored edge *weights* use a buggy
formula (`fine_edge_matrix.coeff(fine, parent)` indexes the fine matrix
by a coarse index, `src/multigrid.cpp:151`; SURVEY.md §2.1-C7 quirk 1)
and are never read downstream -- only the sparsity *pattern* matters
(`src/multigrid.cpp:237` tests existence; C12 uses pattern + positions).
We therefore build the exact same pattern with a one-shot sort/scatter
(replacing the O(nnz)-per-insert ``coeffRef`` hot spot, quirk 2) and
store clean Euclidean coarse-point distances as the values.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gravomg_tpu.types import Graph, INVALID_INDEX
from gravomg_tpu.ops.segment import build_ell_rows


@functools.partial(jax.jit, static_argnames=("n_coarse", "max_degree"))
def extract_coarse_edges(graph: Graph, parents: jax.Array, n_coarse: int,
                         max_degree: int,
                         fine_valid=None) -> Tuple[jax.Array, jax.Array]:
    """Build the coarse adjacency pattern.

    ``fine_valid``: optional (V,) bool marking real (non-phantom) fine
    vertices; phantom rows contribute no coarse edges (their parents are
    unset garbage in the fully-device-resident build).

    Returns:
      (columns (n_coarse, max_degree) int32 ascending with INVALID_INDEX
       padding, overflow () bool).
    """
    v, k = graph.neighbors.shape
    rows = jnp.broadcast_to(parents[:, None], (v, k))
    cols = parents[graph.safe_neighbors()]
    valid = graph.mask & (rows != cols)
    if fine_valid is not None:
        valid &= fine_valid[:, None]
    res = build_ell_rows(rows.reshape(-1), cols.reshape(-1),
                         valid.reshape(-1), n_coarse, max_degree)
    return res.columns, res.overflow


@jax.jit
def coarse_graph(columns: jax.Array, coarse_points: jax.Array) -> Graph:
    """Assemble a Graph for the coarse level with Euclidean distances."""
    mask = columns != INVALID_INDEX
    safe = jnp.where(mask, columns, 0)
    dist = jnp.linalg.norm(
        coarse_points[:, None, :] - coarse_points[safe], axis=-1)
    dist = jnp.where(mask, dist.astype(coarse_points.dtype), jnp.inf)
    return Graph(neighbors=columns, distances=dist, points=coarse_points)

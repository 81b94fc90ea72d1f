"""Coarse point placement: mean of fine children.

Reference C8 ``coarseFromMeanOfFineChildren`` (`src/multigrid.cpp:171-207`):
each coarse point moves to the mean of the fine points in its Voronoi
cell; a "lonely" cell containing only its seed additionally absorbs the
seed's fine-graph neighbors into the average (`src/multigrid.cpp:183-191`,
the reference's own `todo: is this actually helpful?`).

TPU-native: one segment-sum / segment-count pass plus a masked fix-up for
singleton cells (SURVEY.md §2.1-C8).  The reference's ``std::set`` dedup
is a no-op for us: ELL neighbor rows hold distinct non-self entries, so
the patched cell is exactly {seed} ∪ neighbors(seed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gravomg_tpu.types import Graph


def coarse_from_mean_of_fine_children(
        graph: Graph, parents: jax.Array, coarse_samples: jax.Array,
) -> jax.Array:
    """Returns (C, 3) coarse positions."""
    points = graph.points
    c = coarse_samples.shape[0]
    sums = jnp.zeros((c, points.shape[1]), points.dtype)
    sums = sums.at[parents].add(points)
    counts = jnp.zeros((c,), jnp.int32).at[parents].add(1)

    # Lonely-cell patch: a 1-child cell's only child is its seed (the seed
    # always maps to itself at distance 0).
    seeds = coarse_samples
    nbr_mask = graph.mask[seeds]                       # (C, K)
    nbr_pts = points[graph.safe_neighbors()[seeds]]    # (C, K, 3)
    patched_sum = points[seeds] + jnp.sum(
        jnp.where(nbr_mask[:, :, None], nbr_pts, 0.0), axis=1)
    patched_count = 1 + jnp.sum(nbr_mask, axis=1)

    lonely = counts == 1
    final_sum = jnp.where(lonely[:, None], patched_sum, sums)
    final_count = jnp.where(lonely, patched_count, jnp.maximum(counts, 1))
    return final_sum / final_count[:, None].astype(points.dtype)

"""Voronoi-triangle enumeration on the coarse graph.

Reference C9 ``constructVoronoiTriangles`` (`src/multigrid.cpp:209-263`):
for each vertex v0, every pair of its neighbors (v1, v2) with
v0 < v1 < v2 that are themselves adjacent forms a triangle; the normal is
``normalize((p1 - p0) x (p2 - p0))`` (`src/multigrid.cpp:240-242`;
winding, and hence normal sign, is arbitrary -- downstream math is
sign-robust, SURVEY.md §2.1-C9).  Triangle ids are assigned in
enumeration order and per-vertex association lists are therefore
ascending (`src/multigrid.cpp:253-256`); we reproduce both exactly, since
the prolongation's first-hit tie-break iterates association lists in
order (`src/multigrid.cpp:356,374-380`).

TPU-native: the candidate tensor (C, K, K) over sorted neighbor-slot
pairs is evaluated with a vectorized adjacency membership test, compacted
with a static-size nonzero, and association lists are grouped with one
stable sort (SURVEY.md §7 step 3).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gravomg_tpu.types import Graph, TriangleSet, INVALID_INDEX
from gravomg_tpu.ops.segment import group_ordered


@functools.partial(jax.jit, static_argnames=("max_triangles", "max_assoc"))
def construct_voronoi_triangles(coarse: Graph, max_triangles: int,
                                max_assoc: int) -> Tuple[TriangleSet, jax.Array]:
    """Enumerate coarse-graph triangles.

    Args:
      coarse: coarse-level graph (rows ascending).
      max_triangles: static pad for the triangle list (planar-ish graphs
        have ~2C triangles; overflow is flagged).
      max_assoc: static pad for per-vertex association lists.

    Returns:
      (TriangleSet, overflow () bool).
    """
    c, k = coarse.neighbors.shape
    nbr = coarse.safe_neighbors()
    m = coarse.mask
    idx = jnp.arange(c, dtype=jnp.int32)
    raw = coarse.neighbors                             # sorted, INT_MAX pad

    chunk = max(1, min(c, 4096))
    cpad = ((c + chunk - 1) // chunk) * chunk
    pad = cpad - c
    # Per-anchor triangle cap: triangles anchored at v0 are adjacent
    # pairs among its higher-indexed neighbors -- bounded by ~K on
    # surface-like graphs.  Keeps all compaction state at (C, cap)
    # instead of a (C, K, K) tensor whose lane padding OOMs at 1M
    # (measured: 13 GB at C=424k, K=48).  The pair mask itself is also
    # built per chunk: a global (C, K, K) bool tile-pads to ~3.5 GB at
    # C=400k, K=48 -- the 1M OOM of round 3.
    row_cap = min(2 * k, k * (k - 1) // 2)

    def padc(a, fill=0):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    slot_ok = (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])[None]

    def anchored_chunk(args):
        nbrc, rawc, mc, idxc = args     # (cc, K) x3, (cc,)
        # Candidate (v0; slot k1 < slot k2).  Rows are ascending, so
        # slot order == index order and v2 > v1 automatically; the
        # reference's `vertex_1 < vertex_0 -> skip`
        # (`src/multigrid.cpp:225,232`) reduces to v1 > v0.
        pmc = mc[:, :, None] & mc[:, None, :] & slot_ok
        pmc &= nbrc[:, :, None] > idxc[:, None, None]
        # Adjacency membership: exists[c, k1, k2] = v2 in
        # neighbors(v1), via binary search in the ascending row of v1
        # (O(K^2 log K) per vertex instead of the O(K^3) compare).
        rows_v1 = raw[nbrc]                            # (cc, K, K_inner)
        search = jax.vmap(jax.vmap(jnp.searchsorted, in_axes=(0, None)),
                          in_axes=(0, 0))
        pos = search(rows_v1, rawc)                    # (cc, K_1, K_2)
        found = jnp.take_along_axis(rows_v1, jnp.minimum(pos, k - 1),
                                    axis=2)
        tm = pmc & (found == rawc[:, None, :])         # (cc, K, K) bool
        # Compact each row's valid (k1, k2) pairs in lex order.
        code = (jnp.arange(k, dtype=jnp.int32)[:, None] * k
                + jnp.arange(k, dtype=jnp.int32)[None, :])[None]
        keys = jnp.where(tm, code, jnp.int32(k * k)).reshape(-1, k * k)
        keys = jnp.sort(keys, axis=1)[:, :row_cap]     # (cc, row_cap)
        counts = jnp.sum(tm, axis=(1, 2)).astype(jnp.int32)
        return keys, counts

    keys, row_counts = jax.lax.map(
        anchored_chunk,
        (padc(nbr).reshape(-1, chunk, k),
         padc(raw, 0).reshape(-1, chunk, k),
         padc(m, False).reshape(-1, chunk, k),
         padc(idx, 0).reshape(-1, chunk)))
    keys = keys.reshape(cpad, row_cap)[:c]             # (C, row_cap)
    row_counts = row_counts.reshape(cpad)[:c]
    row_overflow = jnp.any(row_counts > row_cap)
    row_counts = jnp.minimum(row_counts, row_cap)

    # Global triangle ids = exclusive row offsets + in-row slot: exactly
    # the reference's (v0, k1, k2) enumeration order.
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(row_counts, dtype=jnp.int32)])
    total = offsets[-1]
    overflow = (total > max_triangles) | row_overflow
    slot = jnp.arange(row_cap, dtype=jnp.int32)[None, :]
    valid_rc = slot < row_counts[:, None]
    tid_pos = jnp.where(valid_rc, offsets[:-1, None] + slot,
                        max_triangles)                 # (C, row_cap)
    t_v0_src = jnp.broadcast_to(idx[:, None], (c, row_cap))
    safe_keys = jnp.where(valid_rc, keys, 0)
    t_k1_src = safe_keys // k
    t_k2_src = safe_keys % k

    def scatter_flat(src):
        buf = jnp.full((max_triangles + 1,), 0, jnp.int32)
        return buf.at[tid_pos.reshape(-1)].set(
            src.reshape(-1))[:max_triangles]

    t_v0 = scatter_flat(t_v0_src)
    t_k1 = scatter_flat(t_k1_src)
    t_k2 = scatter_flat(t_k2_src)
    valid_t = jnp.arange(max_triangles) < total
    t_v1 = nbr[t_v0, t_k1]
    t_v2 = nbr[t_v0, t_k2]
    vertices = jnp.stack([t_v0, t_v1, t_v2], axis=1)
    vertices = jnp.where(valid_t[:, None], vertices, INVALID_INDEX)

    p0 = coarse.points[t_v0]
    p1 = coarse.points[t_v1]
    p2 = coarse.points[t_v2]
    cr = jnp.cross(p1 - p0, p2 - p0)
    normals = cr / jnp.maximum(
        jnp.linalg.norm(cr, axis=1, keepdims=True), 1e-30)

    # Association lists: triangle ids grouped per vertex, ascending.
    tid = jnp.arange(max_triangles, dtype=jnp.int32)
    rows = jnp.concatenate([t_v0, t_v1, t_v2])
    pay = jnp.concatenate([tid, tid, tid])
    av = jnp.concatenate([valid_t, valid_t, valid_t])
    assoc, _, assoc_overflow = group_ordered(rows, pay, av, c, max_assoc)

    return (TriangleSet(vertices=vertices, normals=normals, assoc=assoc),
            overflow | assoc_overflow)

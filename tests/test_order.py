"""Morton reordering: permutation correctness + locality improvement."""

import numpy as np
import jax.numpy as jnp

import gravomg_tpu as g
from gravomg_tpu.geometry.order import bandwidth, morton_order, permute_graph
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.types import INVALID_INDEX


def test_permute_graph_preserves_structure(rng):
    pts = torus_points(600, seed=2)
    graph = g.knn_graph(jnp.asarray(pts), k=8)
    perm = morton_order(pts)
    pg = permute_graph(graph, perm)
    # Points permuted.
    np.testing.assert_allclose(np.asarray(pg.points), pts[perm])
    # Edge sets map exactly through the permutation.
    inv = np.empty(len(pts), np.int64)
    inv[perm] = np.arange(len(pts))
    nbr_old = np.asarray(graph.neighbors)
    nbr_new = np.asarray(pg.neighbors)
    for new_i in rng.choice(len(pts), 50, replace=False):
        old_i = perm[new_i]
        old_set = {inv[j] for j in nbr_old[old_i]
                   if j != INVALID_INDEX}
        new_set = {int(j) for j in nbr_new[new_i] if j != INVALID_INDEX}
        assert old_set == new_set
        row = nbr_new[new_i][nbr_new[new_i] != INVALID_INDEX]
        assert (np.diff(row) > 0).all()   # ascending contract


def test_morton_improves_bandwidth(rng):
    pts = torus_points(4000, seed=7)
    shuffled = rng.permutation(4000)
    graph = g.knn_graph(jnp.asarray(pts[shuffled]), k=8)
    bw0 = bandwidth(graph)
    pg = permute_graph(graph, morton_order(pts[shuffled]))
    bw1 = bandwidth(pg)
    assert bw1 < bw0


def test_solve_invariant_under_reordering(rng):
    pts = torus_points(800, seed=4)
    graph = g.knn_graph(jnp.asarray(pts), k=8)
    perm = morton_order(pts)
    pg = permute_graph(graph, perm)
    cfg = g.MultigridConfig(coarse_threshold=50)
    for gr in (graph, pg):
        lap, mass = g.graph_laplacian(gr, "invdist")
        spd = lap._replace(diag=lap.diag + 0.5 * mass)
        h = g.build_hierarchy(gr, spd, cfg)
        b = jnp.asarray(rng.normal(size=800))
        if gr is graph:
            b_used = b
        else:
            b_used = b[jnp.asarray(perm)]
        x, rel, it = g.solve(h.solver, b_used, cfg)
        assert float(rel) < cfg.tolerance

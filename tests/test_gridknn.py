"""Spatial-hash kNN vs brute force: identical up to floating near-ties.

The two paths compute distances differently (grid: direct squared
difference; brute: the MXU-friendly norm expansion), so entries at the
kth boundary can flip when two candidates are within float noise of each
other.  Any disagreement must be such a near-tie.
"""

import numpy as np
import jax.numpy as jnp

import gravomg_tpu as g
from gravomg_tpu.geometry.gridknn import grid_knn_graph
from gravomg_tpu.geometry.meshes import icosphere, torus_points
from gravomg_tpu.types import INVALID_INDEX


def _rows(nb, i):
    r = nb[i]
    return set(r[r != INVALID_INDEX].tolist())


def test_grid_knn_matches_brute_up_to_ties(rng):
    v, _ = icosphere(6)            # 40962: above the brute-fallback cutoff
    v = (v + rng.normal(scale=1e-3, size=v.shape)).astype(np.float32)
    k = 16
    gg = grid_knn_graph(jnp.asarray(v), k=k)
    gb = g.knn_graph(jnp.asarray(v), k=k)
    nb_g = np.asarray(gg.neighbors)
    nb_b = np.asarray(gb.neighbors)
    diff_rows = np.nonzero((nb_g != nb_b).any(axis=1))[0]
    # Few rows may differ, and only by swapping near-equidistant points.
    assert len(diff_rows) < 0.01 * v.shape[0]
    for i in diff_rows:
        only_g = _rows(nb_g, i) - _rows(nb_b, i)
        only_b = _rows(nb_b, i) - _rows(nb_g, i)
        for j in only_g | only_b:
            d = np.linalg.norm(v[i] - v[j])
            others = list((only_g | only_b) - {j})
            assert any(abs(d - np.linalg.norm(v[i] - v[o])) < 1e-4 * (1 + d)
                       for o in others) or len(others) == 0


def test_grid_knn_small_falls_back(rng):
    pts = torus_points(500, seed=3)
    gg = grid_knn_graph(jnp.asarray(pts), k=8)
    gb = g.knn_graph(jnp.asarray(pts), k=8)
    np.testing.assert_array_equal(np.asarray(gg.neighbors),
                                  np.asarray(gb.neighbors))


def test_grid_knn_hierarchy_end_to_end(rng):
    v, _ = icosphere(6)
    v = (v + rng.normal(scale=1e-3, size=v.shape)).astype(np.float32)
    graph = grid_knn_graph(jnp.asarray(v), k=12)
    lap, mass = g.graph_laplacian(graph, "invdist")
    spd = lap._replace(diag=lap.diag + 0.5 * mass)
    cfg = g.MultigridConfig(coarse_threshold=500, tolerance=1e-8)
    h = g.build_hierarchy(graph, spd, cfg)
    b = jnp.asarray(rng.normal(size=v.shape[0]), jnp.float32)
    # f32 stationary cycles hit their noise floor ~1e-4 at this scale;
    # f64 iterative refinement certifies 1e-8 (BASELINE target).
    x, rel, it = g.solve_refined(h.solver, b, cfg)
    assert float(rel) < 1e-8
    assert int(it) < 60

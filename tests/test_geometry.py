"""Geometry layer tests: scale_mesh (C1), kNN graph, Laplacians."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree

import gravomg_tpu as g
from gravomg_tpu.geometry.meshes import (grid_mesh, icosphere, mesh_edges,
                                         max_vertex_degree)
from gravomg_tpu.types import INVALID_INDEX


def test_scale_mesh_semantics(rng):
    pts = rng.normal(size=(200, 3)) * np.array([3.0, 1.0, 0.5]) + 7.0
    out = np.asarray(g.scale_mesh(jnp.asarray(pts), 1.0))
    mins, maxs = out.min(0), out.max(0)
    # Longest bbox edge is exactly scale_ratio and the bbox is centered
    # (`src/utility.cpp:28-40` semantics).
    assert abs((maxs - mins).max() - 1.0) < 1e-12
    np.testing.assert_allclose(mins + maxs, 0.0, atol=1e-12)


def test_knn_graph_matches_kdtree(rng):
    pts = rng.normal(size=(700, 3))
    k = 8
    graph = g.knn_graph(jnp.asarray(pts), k=k)
    tree = cKDTree(pts)
    _, idx = tree.query(pts, k=k + 1)
    idx = idx[:, 1:]  # drop self
    directed = set()
    for i in range(pts.shape[0]):
        for j in idx[i]:
            directed.add((i, int(j)))
    expected = [sorted({j for (a, j) in directed if a == i}
                       | {a for (a, j) in directed if j == i})
                for i in range(pts.shape[0])]
    nbr = np.asarray(graph.neighbors)
    dist = np.asarray(graph.distances)
    for i in range(pts.shape[0]):
        mine = nbr[i][nbr[i] != INVALID_INDEX]
        np.testing.assert_array_equal(mine, expected[i])
        np.testing.assert_allclose(
            dist[i][:len(mine)],
            np.linalg.norm(pts[mine] - pts[i], axis=1), rtol=1e-12)


def test_graph_laplacian_properties(rng):
    pts = rng.normal(size=(300, 3))
    graph = g.knn_graph(jnp.asarray(pts), k=6)
    lap, mass = g.graph_laplacian(graph, "invdist")
    # Row sums of L are zero (diag = -sum offdiag) and mass positive.
    row_sums = np.asarray(lap.diag) + np.asarray(
        jnp.where(lap.mask, lap.offdiag, 0.0).sum(1))
    np.testing.assert_allclose(row_sums, 0.0, atol=1e-10)
    assert (np.asarray(mass) > 0).all()
    # L annihilates constants.
    ones = jnp.ones(graph.num_vertices)
    np.testing.assert_allclose(np.asarray(g.spmv(lap, ones)), 0.0,
                               atol=1e-10)


def test_cotan_laplacian_grid(rng):
    # On a uniform right-triangulated grid the cotan Laplacian of a
    # linear function is zero away from the boundary.
    v, f = grid_mesh(10, 10)
    kmax = max_vertex_degree(f, v.shape[0])
    lap, mass = g.cotan_laplacian(jnp.asarray(v), jnp.asarray(f), kmax + 2)
    lin = jnp.asarray(2.0 * v[:, 0] - 3.0 * v[:, 1] + 0.5)
    res = np.asarray(g.spmv(lap, lin))
    interior = np.array([i for i in range(v.shape[0])
                         if 0 < i // 10 < 9 and 0 < i % 10 < 9])
    np.testing.assert_allclose(res[interior], 0.0, atol=1e-10)
    # Total mass equals total surface area.
    area = 1.0
    assert abs(float(jnp.sum(mass)) - area) < 1e-10


def test_graph_from_edges_symmetry(rng):
    v, f = icosphere(2)
    edges = mesh_edges(f)
    kmax = max_vertex_degree(f, v.shape[0])
    graph = g.graph_from_edges(jnp.asarray(v), jnp.asarray(edges), kmax + 2)
    nbr = np.asarray(graph.neighbors)
    for i in range(v.shape[0]):
        for j in nbr[i][nbr[i] != INVALID_INDEX]:
            row_j = nbr[j][nbr[j] != INVALID_INDEX]
            assert i in row_j

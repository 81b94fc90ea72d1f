"""IO + serialization + native host-library tests."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

import gravomg_tpu as g
from gravomg_tpu.geometry.meshes import icosphere, torus_points
from gravomg_tpu.io.meshio import read_obj, read_ply, write_obj, write_ply
from gravomg_tpu.io.serialization import load_solver, save_solver
from gravomg_tpu.io import native

import oracle


def test_obj_roundtrip(tmp_path):
    v, f = icosphere(1)
    p = str(tmp_path / "m.obj")
    write_obj(p, v, f)
    v2, f2 = read_obj(p)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_ply_roundtrip(tmp_path):
    v, f = icosphere(1)
    p = str(tmp_path / "m.ply")
    write_ply(p, v, f)
    v2, f2 = read_ply(p)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_solver_serialization_roundtrip(rng, tmp_path):
    pts = torus_points(500, seed=8)
    graph = g.knn_graph(jnp.asarray(pts), k=8)
    lap, mass = g.graph_laplacian(graph)
    spd = lap._replace(diag=lap.diag + 0.5 * mass)
    cfg = g.MultigridConfig(coarse_threshold=50, smoother="chebyshev")
    h = g.build_hierarchy(graph, spd, cfg)
    p = str(tmp_path / "h.npz")
    save_solver(p, h.solver)
    h2 = load_solver(p)
    b = jnp.asarray(rng.normal(size=500))
    x1, rel1, _ = g.solve(h.solver, b, cfg)
    x2, rel2, _ = g.solve(h2, b, cfg)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-12)


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable")
def test_native_matches_oracle(rng):
    pts = torus_points(700, seed=9)
    graph = g.knn_graph(jnp.asarray(pts), k=8)
    nbr = np.asarray(graph.neighbors)
    dist = np.asarray(graph.distances)
    radius = float(g.sampling_radius(graph))
    sel_n = native.disc_sample(nbr, dist, radius)
    sel_o = oracle.disc_sample(pts, nbr, dist, radius)
    np.testing.assert_array_equal(sel_n, sel_o)
    pn, dn = native.assign_parents(nbr, pts, sel_n)
    po, do = oracle.assign_parents(pts, nbr, dist, sel_o)
    np.testing.assert_array_equal(pn, po)
    np.testing.assert_allclose(dn, do, rtol=1e-12)
    assert abs(native.average_edge_length(nbr, dist)
               - float(g.average_edge_length(graph))) < 1e-9


def test_solve_with_history(rng):
    from gravomg_tpu.solve.vcycle import solve_with_history
    pts = torus_points(500, seed=8)
    graph = g.knn_graph(jnp.asarray(pts), k=8)
    lap, mass = g.graph_laplacian(graph)
    spd = lap._replace(diag=lap.diag + 0.5 * mass)
    cfg = g.MultigridConfig(coarse_threshold=50)
    h = g.build_hierarchy(graph, spd, cfg)
    b = jnp.asarray(rng.normal(size=500))
    x, rel, it, hist = solve_with_history(h.solver, b, cfg)
    hist = np.asarray(hist)
    n = int(it)
    assert np.isfinite(hist[:n]).all() and np.isinf(hist[n:]).all()
    # Monotone-ish decay for a stationary method on an SPD problem.
    assert hist[n - 1] < cfg.tolerance
    assert (np.diff(np.log10(hist[:n])) < 0.5).all()

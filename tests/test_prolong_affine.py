"""Affine (lane-major) prolongation kernel vs the sequential-formula
kernel.

The affine path (`_prolongation_block_affine`) computes barycentric
signs from per-(triangle, rotation) gradient vectors -- algebraically
identical to the reference's projected sub-area formula
(`src/multigrid.cpp:29-35`), so on generic point clouds case selection
must agree exactly and weights to f32 roundoff.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import gravomg_tpu as g
from gravomg_tpu.geometry.meshes import torus_points


def _pipeline(n, seed, k=10):
    pts64 = torus_points(n, seed=seed)
    graph = g.knn_graph(jnp.asarray(pts64, jnp.float32), k=k)
    radius = g.sampling_radius(graph)
    sel = g.fast_disc_sample(graph, radius)
    par, _ = g.assign_parents(graph, jnp.asarray(sel))
    n_coarse = len(sel)
    cols, ovf = g.extract_coarse_edges(graph, par, n_coarse, 64)
    assert not bool(ovf)
    cp = g.coarse_from_mean_of_fine_children(graph, par, jnp.asarray(sel))
    cg = g.coarse_graph(cols, cp)
    tris, t_ovf = g.construct_voronoi_triangles(cg, 8 * n_coarse, 256)
    assert not bool(t_ovf)
    return graph, par, cp, cg, tris


@pytest.mark.parametrize("scheme", [g.BARYCENTRIC, g.UNIFORM, g.INVDIST])
def test_affine_matches_exact_f32(scheme):
    graph, par, cp, cg, tris = _pipeline(4000, seed=7)
    u_ex, counts_ex, _ = g.construct_prolongation(
        graph.points, par, cp, cg.neighbors, tris, scheme=scheme,
        affine="off")
    u_af, counts_af, _ = g.construct_prolongation(
        graph.points, par, cp, cg.neighbors, tris, scheme=scheme,
        affine="on")
    # Same case selection everywhere (no sign flips on a generic cloud).
    np.testing.assert_array_equal(np.asarray(counts_ex),
                                  np.asarray(counts_af))
    np.testing.assert_array_equal(np.asarray(u_ex.cols),
                                  np.asarray(u_af.cols))
    w_ex = np.asarray(u_ex.weights, np.float64)
    w_af = np.asarray(u_af.weights, np.float64)
    err = np.abs(w_ex - w_af).max()
    assert err < 2e-5, err


def test_affine_auto_dispatch():
    graph, par, cp, cg, tris = _pipeline(2000, seed=3)
    u_auto, _, _ = g.construct_prolongation(
        graph.points, par, cp, cg.neighbors, tris)
    u_on, _, _ = g.construct_prolongation(
        graph.points, par, cp, cg.neighbors, tris, affine="on")
    np.testing.assert_array_equal(np.asarray(u_auto.cols),
                                  np.asarray(u_on.cols))
    np.testing.assert_array_equal(np.asarray(u_auto.weights),
                                  np.asarray(u_on.weights))


def test_two_pass_escalation_exact():
    """A tiny first-pass slice forces heavy escalation; results must be
    identical to the single full-width pass."""
    graph, par, cp, cg, tris = _pipeline(4000, seed=11)
    u_full, counts_full, ovf_full = g.construct_prolongation(
        graph.points, par, cp, cg.neighbors, tris, affine="on",
        first_pass_assoc=0)
    u_two, counts_two, ovf_two = g.construct_prolongation(
        graph.points, par, cp, cg.neighbors, tris, affine="on",
        first_pass_assoc=4)
    assert not bool(ovf_full)
    assert not bool(ovf_two)
    np.testing.assert_array_equal(np.asarray(counts_full),
                                  np.asarray(counts_two))
    np.testing.assert_array_equal(np.asarray(u_full.cols),
                                  np.asarray(u_two.cols))
    np.testing.assert_array_equal(np.asarray(u_full.weights),
                                  np.asarray(u_two.weights))


def test_assoc_rot_consistent():
    """assoc_rot[v, a] is the slot of v in triangle assoc[v, a]."""
    from gravomg_tpu.types import INVALID_INDEX

    _, _, _, _, tris = _pipeline(2000, seed=5)
    assoc = np.asarray(tris.assoc)
    rot = np.asarray(tris.assoc_rot)
    verts = np.asarray(tris.vertices)
    nc, a_max = assoc.shape
    for v in range(0, nc, 7):
        for a in range(a_max):
            t = assoc[v, a]
            if t == INVALID_INDEX:
                continue
            assert verts[t, rot[v, a]] == v

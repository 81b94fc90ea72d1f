"""Block-window dense matvec (ops/blockdense.py) equivalence tests."""

import numpy as np
import jax.numpy as jnp

import gravomg_tpu as g
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.ops.blockdense import (blockdense_from_ell,
                                        blockdense_from_operator,
                                        blockdense_matvec)
from gravomg_tpu.solve.spmv import spmv
from gravomg_tpu.prolong.operator import prolong, restrict


def _real_operator(v=3000, k=8):
    pts = torus_points(v, seed=2)
    pts = pts[morton_order(pts)]
    graph = g.knn_graph(jnp.asarray(pts), k=k)
    lap, mass = g.graph_laplacian(graph, "invdist")
    return lap._replace(diag=lap.diag + 0.5 * mass)


def test_blockdense_matches_ell(rng):
    op = _real_operator()
    bop, ovf = blockdense_from_operator(op, block=64, window=128, nw=4,
                                        escape_cap=4096)
    assert not bool(ovf)
    x = jnp.asarray(rng.normal(size=op.num_vertices))
    np.testing.assert_allclose(np.asarray(blockdense_matvec(bop, x)),
                               np.asarray(spmv(op, x)),
                               rtol=1e-12, atol=1e-12)


def test_blockdense_escape_and_overflow(rng):
    op = _real_operator(v=1500)
    bop, ovf = blockdense_from_operator(op, block=16, window=32, nw=1,
                                        escape_cap=1500 * 8)
    assert not bool(ovf)
    assert int(jnp.sum(bop.esc_w != 0)) > 0
    x = jnp.asarray(rng.normal(size=op.num_vertices))
    np.testing.assert_allclose(np.asarray(blockdense_matvec(bop, x)),
                               np.asarray(spmv(op, x)),
                               rtol=1e-12, atol=1e-12)
    _, ovf2 = blockdense_from_operator(op, block=16, window=32, nw=1,
                                       escape_cap=8)
    assert bool(ovf2)


def _hierarchy(v=2500):
    pts = torus_points(v, seed=3)
    pts = pts[morton_order(pts)]
    graph = g.knn_graph(jnp.asarray(pts), k=8)
    lap, mass = g.graph_laplacian(graph, "invdist")
    spd = lap._replace(diag=lap.diag + 0.5 * mass)
    return g.build_hierarchy(graph, spd,
                             g.MultigridConfig(coarse_threshold=100))


def test_blockdense_rectangular_prolong_restrict(rng):
    h = _hierarchy()
    u = h.solver.levels[0].u
    rt = h.solver.levels[0].ut

    uw, ovf = blockdense_from_ell(u.cols, u.weights,
                                  jnp.ones_like(u.cols, bool),
                                  u.n_coarse, block=64, window=128,
                                  nw=2, escape_cap=u.n_fine)
    assert not bool(ovf)
    xc = jnp.asarray(rng.normal(size=u.n_coarse))
    np.testing.assert_allclose(np.asarray(blockdense_matvec(uw, xc)),
                               np.asarray(prolong(u, xc)),
                               rtol=1e-12, atol=1e-12)

    mask = rt.rows != g.INVALID_INDEX
    utw, ovf = blockdense_from_ell(rt.safe_rows(), rt.weights, mask,
                                   rt.n_fine, block=16, window=512,
                                   nw=2, escape_cap=rt.n_coarse * 8)
    assert not bool(ovf)
    xf = jnp.asarray(rng.normal(size=rt.n_fine))
    np.testing.assert_allclose(np.asarray(blockdense_matvec(utw, xf)),
                               np.asarray(restrict(u, xf)),
                               rtol=1e-11, atol=1e-12)


def test_blockdense_minplus2_matches_dense(rng):
    """Fused dual reduction == dense tropical matvec + thresholded
    neighborhood-min computed independently (escape chute included)."""
    from gravomg_tpu.coarsen.parents import graph_minplus_operator
    from gravomg_tpu.ops.blockdense import (blockdense_minplus,
                                            blockdense_minplus2)

    pts = torus_points(1800, seed=5)
    pts = pts[morton_order(pts)]
    graph = g.knn_graph(jnp.asarray(pts), k=10)
    # Small windows force real escape-chute traffic.
    bd, ovf = graph_minplus_operator(graph, block=16, window=32, nw=2,
                                     escape_cap=1800 * 10)
    assert not bool(ovf)
    v = graph.num_vertices
    thresh = float(g.sampling_radius(graph))

    xd = jnp.where(jnp.asarray(rng.normal(size=v)) > 0.8, 0.0, jnp.inf)
    xp = jnp.asarray(rng.normal(size=v).astype(np.float32))
    yd, yp = blockdense_minplus2(bd, xd, xp, thresh)

    # Distance half == the single-purpose tropical matvec.
    np.testing.assert_array_equal(np.asarray(yd),
                                  np.asarray(blockdense_minplus(bd, xd)))

    # Priority half == dense reference over the ELL graph.
    nbr = np.asarray(graph.safe_neighbors())
    dst = np.asarray(graph.distances)
    msk = np.asarray(graph.mask) & (dst < thresh)
    ref = np.full(v, np.inf, np.float32)
    xpn = np.asarray(xp)
    for i in range(v):
        js = nbr[i][msk[i]]
        if js.size:
            ref[i] = xpn[js].min()
    np.testing.assert_array_equal(np.asarray(yp), ref)

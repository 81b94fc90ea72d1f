"""Banded SpMV (ops/banded.py) equivalence tests."""

import numpy as np
import jax.numpy as jnp

import gravomg_tpu as g
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.ops.banded import banded_from_ell, banded_spmv
from gravomg_tpu.solve.spmv import spmv


def _real_operator(v=3000, k=8):
    pts = torus_points(v, seed=2)
    pts = pts[morton_order(pts)]
    graph = g.knn_graph(jnp.asarray(pts), k=k)
    lap, mass = g.graph_laplacian(graph, "invdist")
    return lap._replace(diag=lap.diag + 0.5 * mass)


def test_banded_matches_ell_real_graph(rng):
    op = _real_operator()
    bop, ovf = banded_from_ell(op, half_width=32, block=16, window=128,
                               nw=2, escape_cap=4096)
    assert not bool(ovf)
    x = jnp.asarray(rng.normal(size=op.num_vertices))
    np.testing.assert_allclose(np.asarray(banded_spmv(bop, x)),
                               np.asarray(spmv(op, x)),
                               rtol=1e-12, atol=1e-12)


def test_banded_escape_chute(rng):
    """With zero windows of coverage (nw windows too narrow to matter),
    far entries must flow through the exact escape chute."""
    op = _real_operator(v=1500)
    bop, ovf = banded_from_ell(op, half_width=4, block=16, window=32,
                               nw=1, escape_cap=1500 * 8)
    assert not bool(ovf)
    assert int(jnp.sum(bop.esc_w != 0)) > 0      # chute actually used
    x = jnp.asarray(rng.normal(size=op.num_vertices))
    np.testing.assert_allclose(np.asarray(banded_spmv(bop, x)),
                               np.asarray(spmv(op, x)),
                               rtol=1e-12, atol=1e-12)


def test_banded_overflow_flag(rng):
    op = _real_operator(v=1500)
    _, ovf = banded_from_ell(op, half_width=4, block=16, window=32,
                             nw=1, escape_cap=8)
    assert bool(ovf)


def test_banded_random_ell(rng):
    """Fully random (non-spatial) ELL operator: everything lands in the
    far/escape paths; result must still be exact."""
    n, k = 400, 6
    cols = np.stack([rng.choice(n, size=k, replace=False)
                     for _ in range(n)])
    cols.sort(axis=1)
    vals = rng.normal(size=(n, k))
    op = g.EllOperator(jnp.asarray(cols, jnp.int32), jnp.asarray(vals),
                       jnp.asarray(rng.normal(size=n)))
    bop, ovf = banded_from_ell(op, half_width=8, block=8, window=64,
                               nw=2, escape_cap=n * k)
    assert not bool(ovf)
    x = jnp.asarray(rng.normal(size=n))
    np.testing.assert_allclose(np.asarray(banded_spmv(bop, x)),
                               np.asarray(spmv(op, x)),
                               rtol=1e-11, atol=1e-12)

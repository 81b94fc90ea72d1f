"""Windowed rectangular matvec (ops/windowed.py) equivalence tests."""

import numpy as np
import jax.numpy as jnp

import gravomg_tpu as g
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.ops.windowed import windowed_from_ell, windowed_matvec
from gravomg_tpu.prolong.operator import (build_restriction, prolong,
                                          restrict)


def _hierarchy(v=2500):
    pts = torus_points(v, seed=3)
    pts = pts[morton_order(pts)]
    graph = g.knn_graph(jnp.asarray(pts), k=8)
    lap, mass = g.graph_laplacian(graph, "invdist")
    spd = lap._replace(diag=lap.diag + 0.5 * mass)
    return g.build_hierarchy(graph, spd,
                             g.MultigridConfig(coarse_threshold=100))


def test_windowed_prolong_matches(rng):
    h = _hierarchy()
    u = h.solver.levels[0].u
    wop, ovf = windowed_from_ell(u.cols, u.weights,
                                 jnp.ones_like(u.cols, bool),
                                 u.n_coarse, block=16, window=128,
                                 nw=2, escape_cap=u.n_fine)
    assert not bool(ovf)
    xc = jnp.asarray(rng.normal(size=u.n_coarse))
    np.testing.assert_allclose(np.asarray(windowed_matvec(wop, xc)),
                               np.asarray(prolong(u, xc)),
                               rtol=1e-12, atol=1e-12)


def test_windowed_restrict_matches(rng):
    h = _hierarchy()
    u = h.solver.levels[0].u
    rt = h.solver.levels[0].ut
    assert rt is not None
    mask = rt.rows != g.INVALID_INDEX
    wop, ovf = windowed_from_ell(rt.safe_rows(), rt.weights, mask,
                                 rt.n_fine, block=16, window=256,
                                 nw=2, escape_cap=rt.n_coarse * 8)
    assert not bool(ovf)
    xf = jnp.asarray(rng.normal(size=rt.n_fine))
    np.testing.assert_allclose(np.asarray(windowed_matvec(wop, xf)),
                               np.asarray(restrict(u, xf)),
                               rtol=1e-11, atol=1e-12)


def test_fast_operators_vcycle_matches(rng):
    """attach_fast_operators changes no results: the gather-free V-cycle
    agrees with the plain path to roundoff, and solve() converges the
    same way."""
    h = _hierarchy()
    cfg = g.MultigridConfig(coarse_threshold=100)
    hf = g.attach_fast_operators(h.solver)
    assert hf.levels[0].banded is not None
    assert hf.levels[0].uw is not None and hf.levels[0].utw is not None
    v = h.solver.levels[0].op.num_vertices
    b = jnp.asarray(rng.normal(size=v))
    x_plain = g.v_cycle(h.solver, jnp.zeros(v), b, cfg)
    x_fast = g.v_cycle(hf, jnp.zeros(v), b, cfg)
    np.testing.assert_allclose(np.asarray(x_fast), np.asarray(x_plain),
                               rtol=1e-10, atol=1e-11)
    x1, rel1, it1 = g.solve(hf, b, cfg)
    assert float(rel1) <= cfg.tolerance
    x2, rel2, it2 = g.mg_pcg(hf, b, cfg)
    assert float(rel2) <= cfg.tolerance


def test_bf16_preconditioner_pcg(rng):
    """bf16 window matrices in the V-cycle preconditioner still let
    f32-outer MG-PCG reach 1e-8."""
    import jax.numpy as jnp2
    h = _hierarchy()
    cfg = g.MultigridConfig(coarse_threshold=100)
    hf = g.attach_fast_operators(h.solver)
    h16 = g.cast_fast_operators(hf, jnp.bfloat16)
    assert h16.levels[0].banded.m.dtype == jnp.bfloat16
    v = h.solver.levels[0].op.num_vertices
    b = jnp.asarray(rng.normal(size=v))   # hierarchy dtype (f64 tests)
    x, rel, it = g.mg_pcg(h16, b, cfg, h_outer=hf)
    assert float(rel) <= cfg.tolerance, float(rel)
    assert int(it) <= 3 * int(g.mg_pcg(hf, b, cfg)[2]) + 5


def test_windowed_overflow(rng):
    h = _hierarchy(1200)
    u = h.solver.levels[0].u
    _, ovf = windowed_from_ell(u.cols, u.weights,
                               jnp.ones_like(u.cols, bool),
                               u.n_coarse, block=16, window=8, nw=1,
                               escape_cap=4)
    assert bool(ovf)

"""Application-level tests: Poisson, heat geodesics, smoothing,
hierarchy reuse (BASELINE configs 1-3 at test scale)."""

import numpy as np
import jax.numpy as jnp
import pytest

import gravomg_tpu as g
from gravomg_tpu.apps.poisson import poisson_hierarchy, solve_poisson
from gravomg_tpu.apps.heat import heat_geodesics, refit_hierarchy
from gravomg_tpu.apps.smoothing import implicit_smooth
from gravomg_tpu.geometry.meshes import icosphere


def _sphere(rng, sub=3):
    v, f = icosphere(sub)
    v = v + rng.normal(scale=1e-3, size=v.shape)
    return g.knn_graph(jnp.asarray(v), k=8)


def test_solve_poisson_vcycle_and_pcg(rng):
    graph = _sphere(rng)
    cfg = g.MultigridConfig(coarse_threshold=64)
    h = poisson_hierarchy(graph, alpha=0.5, cfg=cfg)
    b = jnp.asarray(rng.normal(size=graph.num_vertices))
    for method in ("vcycle", "pcg"):
        x, rel, it = solve_poisson(h, b, cfg, method=method)
        assert float(rel) < cfg.tolerance


def test_screened_poisson_auto_alpha(rng):
    """alpha='auto' pins the screening shift at rel_floor of the mean
    diagonal (f32-representable at ANY density -- a fixed alpha's shift
    vanishes relative to invdist diagonals as density grows and the
    stored operator degenerates to singular-plus-noise; measured at the
    1M bench), and the resulting system still solves to tolerance."""
    from gravomg_tpu.apps.poisson import screened_poisson_operator
    graph = _sphere(rng)
    spd, _ = screened_poisson_operator(graph, alpha="auto")
    lap, _ = g.graph_laplacian(graph, "invdist")
    rel_shift = float(jnp.mean(spd.diag - lap.diag) / jnp.mean(spd.diag))
    assert 0.5e-4 < rel_shift < 2e-4
    cfg = g.MultigridConfig(coarse_threshold=64)
    h = g.build_hierarchy(graph, spd, cfg)
    b = jnp.asarray(rng.normal(size=graph.num_vertices))
    x, rel, it = g.mg_pcg(h.solver, b, cfg)
    assert float(rel) < cfg.tolerance


def test_solve_poisson_refined_reaches_1e8_from_f32(rng):
    graph = _sphere(rng)
    graph = g.Graph(graph.neighbors,
                    graph.distances.astype(jnp.float32),
                    graph.points.astype(jnp.float32))
    cfg = g.MultigridConfig(coarse_threshold=64)
    h = poisson_hierarchy(graph, alpha=0.5, cfg=cfg)
    b = jnp.asarray(rng.normal(size=graph.num_vertices), jnp.float32)
    x, rel, it = solve_poisson(h, b, cfg, refined=True)
    assert float(rel) < 1e-8
    assert x.dtype == jnp.float64


def test_heat_geodesics_monotone_from_source(rng):
    graph = _sphere(rng)
    cfg = g.MultigridConfig(coarse_threshold=64, tolerance=1e-8)
    h = poisson_hierarchy(graph, cfg=cfg)
    src = 0
    phi = np.asarray(heat_geodesics(graph, h, src, cfg=cfg))
    assert phi[src] == 0.0
    # Distances should correlate strongly with true sphere geodesics.
    pts = np.asarray(graph.points)
    p0 = pts[src] / np.linalg.norm(pts[src])
    dots = np.clip(pts @ p0 / np.linalg.norm(pts, axis=1), -1, 1)
    true_geo = np.arccos(dots)
    corr = np.corrcoef(phi, true_geo)[0, 1]
    assert corr > 0.95, corr


def test_implicit_smoothing_shrinks_sphere_noise(rng):
    v, f = icosphere(3)
    noisy = v + rng.normal(scale=0.02, size=v.shape)
    graph = g.knn_graph(jnp.asarray(noisy), k=8)
    cfg = g.MultigridConfig(coarse_threshold=64, tolerance=1e-8)
    h = poisson_hierarchy(graph, cfg=cfg)
    smoothed = np.asarray(implicit_smooth(graph, h, t_factor=2.0, cfg=cfg))
    # Radius variance (noise) should drop substantially.
    def radial_std(p):
        r = np.linalg.norm(p - p.mean(0), axis=1)
        return r.std()
    assert radial_std(smoothed) < 0.6 * radial_std(noisy)


def test_refit_hierarchy_reuse(rng):
    graph = _sphere(rng)
    cfg = g.MultigridConfig(coarse_threshold=64)
    h = poisson_hierarchy(graph, alpha=0.5, cfg=cfg)
    lap, mass = g.graph_laplacian(graph, "invdist")
    new_op = lap._replace(diag=lap.diag + 2.0 * mass)
    sh = refit_hierarchy(h, new_op, cfg)
    b = jnp.asarray(rng.normal(size=graph.num_vertices))
    x, rel, it = g.solve(sh, b, cfg)
    assert float(rel) < cfg.tolerance
    true_rel = float(jnp.linalg.norm(g.spmv(new_op, x) - b)
                     / jnp.linalg.norm(b))
    assert true_rel < 1e-6


def test_laplace_eigs_match_dense_oracle(rng):
    # MG-preconditioned LOBPCG vs a dense f64 generalized eigensolve of
    # the same (L, M) pencil (BASELINE config 5 "spectral" workload).
    from gravomg_tpu.apps.spectral import laplace_eigs
    import scipy.linalg as sla

    graph = _sphere(rng, sub=2)
    cfg = g.MultigridConfig(coarse_threshold=64, smoother="chebyshev")
    k = 6
    lams, vecs, res = laplace_eigs(graph, k=k, cfg=cfg, iters=60,
                                   tol=1e-7)
    lap, mass = g.graph_laplacian(graph, "invdist")
    n = graph.num_vertices
    dense = np.zeros((n, n))
    nb = np.asarray(lap.neighbors)
    w = np.asarray(lap.offdiag, np.float64)
    msk = np.asarray(lap.mask)
    for i in range(n):
        dense[i, nb[i][msk[i]]] = w[i][msk[i]]
    dense[np.arange(n), np.arange(n)] = np.asarray(lap.diag, np.float64)
    ref = sla.eigh(dense, np.diag(np.asarray(mass, np.float64)),
                   eigvals_only=True, subset_by_index=[0, k - 1])
    lams = np.asarray(lams, np.float64)
    # Nullspace pair: lam0 ~ 0 for both.
    assert abs(lams[0]) < 1e-5 * ref[k - 1]
    assert abs(ref[0]) < 1e-9 * ref[k - 1]
    # Nonzero eigenvalues to f32-appropriate relative accuracy.
    rel_err = np.abs(lams[1:] - ref[1:]) / ref[1:]
    assert rel_err.max() < 1e-3, (lams, ref)
    # Eigenvectors satisfy the pencil equation.
    mv = np.asarray(mass, np.float64)[:, None] * np.asarray(vecs)
    lres = dense @ np.asarray(vecs) - mv * lams[None, :]
    assert np.linalg.norm(lres, axis=0).max() < 1e-3


def test_laplace_eigs_reuses_hierarchy(rng):
    from gravomg_tpu.apps.spectral import laplace_eigs

    graph = _sphere(rng, sub=2)
    cfg = g.MultigridConfig(coarse_threshold=64)
    h = poisson_hierarchy(graph, alpha=0.5, cfg=cfg)
    lams, vecs, res = laplace_eigs(graph, k=4, cfg=cfg, h=h, iters=40)
    assert float(jnp.max(res[1:])) < 1e-4
    # M-orthonormal block.
    _, mass = g.graph_laplacian(graph, "invdist")
    gram = np.asarray(vecs).T @ (np.asarray(mass)[:, None]
                                 * np.asarray(vecs))
    assert np.abs(gram - np.eye(4)).max() < 1e-4


def test_spectral_alpha_scale_aware():
    # The Poisson "auto" screening shift grows like 1/h^3 in pencil
    # units and overtakes lam_1 at scale (355 vs 154 at 100k measured),
    # flattening the LOBPCG preconditioner; spectral_alpha must stay
    # below it at density while never dropping under the f32-SPD floor.
    from gravomg_tpu.apps.spectral import spectral_alpha
    from gravomg_tpu.geometry.meshes import torus_points
    from gravomg_tpu.geometry.order import morton_order
    from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync

    pts = torus_points(20000, seed=6).astype(np.float32)
    pts = pts[morton_order(pts)]
    graph, short = grid_knn_graph_nosync(pts, 12, margin=2.4)
    assert not bool(short)
    lap, mass = g.graph_laplacian(graph, "invdist")
    dom = float(jnp.mean(lap.diag) / jnp.mean(mass))
    auto, floor = 1e-4 * dom, 1e-5 * dom
    a = float(spectral_alpha(graph))
    assert floor <= a <= auto
    # Derive the expectation from the same lam_1 estimate the function
    # uses (Rayleigh quotients of the M-centered coordinates) instead of
    # hardcoding a density-dependent margin against "auto".
    from gravomg_tpu.solve.spmv import spmv
    v = graph.points - (jnp.sum(mass[:, None] * graph.points, axis=0)
                        / jnp.sum(mass))[None, :]
    var = jnp.sum(mass[:, None] * v * v, axis=0)
    rq = jnp.sum(v * spmv(lap, v), axis=0) / jnp.maximum(var, 1e-30)
    lam1 = float(jnp.min(jnp.where(var > 1e-6 * jnp.max(var), rq,
                                   jnp.inf)))
    expected = min(max(0.25 * lam1, floor), auto)
    assert a == pytest.approx(expected, rel=1e-5)

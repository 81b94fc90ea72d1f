"""Bucketed variable-window (slab) operator tests: exactness vs the
uniform block-dense form and the dense oracle, V-cycle integration,
and the Pallas kernel in interpreter mode (ops/slab.py,
ops/pallas_blockdense.py)."""

import numpy as np
import jax.numpy as jnp

import gravomg_tpu as g
from gravomg_tpu.ops.blockdense import (blockdense_from_ell,
                                        blockdense_matvec)
from gravomg_tpu.ops.slab import (slab_from_ell, slab_matvec,
                                  window_counts)


def _tailed_ell(rng, r=1000, k=10, nc=1000, far_p=0.03):
    """Locality-ordered ELL columns with a heavy far-column tail (the
    Morton-seam pattern that motivates bucketing)."""
    base = (np.arange(r) * nc // r)[:, None]
    cols = np.clip(base + rng.integers(-80, 80, size=(r, k)), 0, nc - 1)
    far = rng.random((r, k)) < far_p
    cols = np.where(far, rng.integers(0, nc, size=(r, k)),
                    cols).astype(np.int32)
    vals = rng.normal(size=(r, k)).astype(np.float32)
    valid = rng.random((r, k)) < 0.9
    return cols, vals, valid


def _dense(cols, vals, valid, r, nc, diag=None):
    d = np.zeros((r, nc), np.float32)
    for i in range(r):
        for j in range(cols.shape[1]):
            if valid[i, j] and vals[i, j] != 0:
                d[i, cols[i, j]] += vals[i, j]
    if diag is not None:
        d[np.arange(r), np.arange(r)] += diag
    return d


def test_slab_matches_uniform_and_dense(rng):
    r = nc = 1000
    cols, vals, valid = _tailed_ell(rng, r=r, nc=nc)
    diag = rng.normal(size=r).astype(np.float32) + 5
    x = rng.normal(size=nc).astype(np.float32)

    sop = slab_from_ell(jnp.asarray(cols), jnp.asarray(vals),
                        jnp.asarray(valid), nc, diag=jnp.asarray(diag),
                        block=8, window=128, use_pallas=False)
    uop, ovf = blockdense_from_ell(jnp.asarray(cols), jnp.asarray(vals),
                                   jnp.asarray(valid), nc,
                                   diag=jnp.asarray(diag), block=8,
                                   window=128, nw=12, escape_cap=8192,
                                   window0=128)
    assert not bool(ovf)
    # The whole point: the slab form is much smaller than uniform.
    assert sop.m_bytes < 0.5 * uop.m.size * 4

    y_u = np.asarray(blockdense_matvec(uop, jnp.asarray(x)))
    y_s = np.asarray(slab_matvec(sop, jnp.asarray(x)))
    y_d = _dense(cols, vals, valid, r, nc, diag) @ x
    scale = np.abs(y_d).max()
    np.testing.assert_allclose(y_s, y_u, atol=2e-6 * scale)
    np.testing.assert_allclose(y_s, y_d, atol=2e-5 * scale)


def test_slab_rectangular(rng):
    """Rectangular (transfer-shaped) slab operator vs dense."""
    r, nc = 1200, 400
    cols = np.clip((np.arange(r) * nc // r)[:, None]
                   + rng.integers(-30, 30, size=(r, 3)), 0,
                   nc - 1).astype(np.int32)
    vals = rng.normal(size=(r, 3)).astype(np.float32)
    valid = np.ones((r, 3), bool)
    x = rng.normal(size=nc).astype(np.float32)
    sop = slab_from_ell(jnp.asarray(cols), jnp.asarray(vals),
                        jnp.asarray(valid), nc, block=8, window=128,
                        use_pallas=False)
    y_s = np.asarray(slab_matvec(sop, jnp.asarray(x)))
    y_d = _dense(cols, vals, valid, r, nc) @ x
    np.testing.assert_allclose(y_s, y_d, atol=1e-5 * np.abs(y_d).max())


def test_window_counts_aligned_cover(rng):
    """Aligned greedy counts: every valid column is covered by the
    windows the count implies (the slab converter's invariant)."""
    cols, vals, valid = _tailed_ell(rng, r=256, k=6, nc=512)
    counts, first, ovf = window_counts(jnp.asarray(cols),
                                       jnp.asarray(valid), 8, 128,
                                       align=128)
    assert not bool(ovf)
    counts = np.asarray(counts)
    # Re-run the aligned greedy in NumPy and compare.
    for b in range(32):
        cb = np.sort(cols[b * 8:(b + 1) * 8][valid[b * 8:(b + 1) * 8]])
        n = 0
        i = 0
        while i < len(cb):
            s = (cb[i] // 128) * 128
            i = np.searchsorted(cb, s + 128)
            n += 1
        assert counts[b] == n, b


def test_slab_pallas_interpret(rng):
    """Pallas kernel (interpret mode) matches the XLA bucket path."""
    r = nc = 640
    cols, vals, valid = _tailed_ell(rng, r=r, k=8, nc=nc)
    x = rng.normal(size=nc).astype(np.float32)
    sop = slab_from_ell(jnp.asarray(cols), jnp.asarray(vals),
                        jnp.asarray(valid), nc, block=8, window=128,
                        use_pallas=False)
    from gravomg_tpu.ops.pallas_blockdense import blockdense_matvec_pallas
    y_x = np.asarray(slab_matvec(sop, jnp.asarray(x), pallas=False))
    parts = [np.asarray(blockdense_matvec_pallas(b, jnp.asarray(x),
                                                 interpret=True))
             for b in sop.buckets]
    ycat = np.concatenate([p.reshape(-1, sop.block) for p in parts])
    y_p = ycat[np.asarray(sop.inv_block_perm)].reshape(-1)[:r]
    np.testing.assert_allclose(y_p, y_x, atol=1e-6 * np.abs(y_x).max())


def test_slab_vcycle_matches_plain(rng):
    """A slab-attached hierarchy produces the same V-cycle (up to f32
    add order) and converges under FCG."""
    from gravomg_tpu.geometry.meshes import torus_points
    from gravomg_tpu.geometry.order import morton_order
    from gravomg_tpu.hierarchy_static import (build_hierarchy_device,
                                              check_diagnostics,
                                              compact_solver)
    pts = torus_points(4000, seed=2).astype(np.float32)
    pts = jnp.asarray(pts[morton_order(pts)])
    graph = g.knn_graph(pts, k=12)
    lap, mass = g.graph_laplacian(graph, "invdist")
    spd = lap._replace(diag=lap.diag + 0.5 * mass)
    cfg = g.MultigridConfig(coarse_threshold=200, smoother="chebyshev")
    h, diags = build_hierarchy_device(graph, spd, cfg)
    check_diagnostics(diags)
    hc = compact_solver(h.solver, diags, row_multiple=64)
    b = jnp.asarray(np.random.default_rng(0).normal(size=4000),
                    jnp.float32)
    x0 = g.v_cycle(hc, jnp.zeros_like(b), b, cfg)
    sol = g.attach_slab_operators(hc, block=8, window=128, min_rows=512,
                                  use_pallas=False)
    sol = g.attach_fast_operators(sol, block=64, window=128)
    assert any(lvl.banded is not None and hasattr(lvl.banded, "buckets")
               for lvl in sol.levels)
    x1 = g.v_cycle(sol, jnp.zeros_like(b), b, cfg)
    rel = float(jnp.linalg.norm(x1 - x0) / jnp.linalg.norm(x0))
    assert rel < 2e-5, rel
    _, r2, it = g.mg_fcg(sol, b, cfg)
    assert float(r2) < cfg.tolerance
    assert int(it) < 25


def test_mxu_slab_matches_uniform(rng):
    """Transposed-tile MXU form (XLA fallback + interpret-mode Pallas)
    matches the uniform operator."""
    r = nc = 2000
    cols, vals, valid = _tailed_ell(rng, r=r, k=10, nc=nc)
    diag = rng.normal(size=r).astype(np.float32) + 5
    x = rng.normal(size=nc).astype(np.float32)
    sop = slab_from_ell(jnp.asarray(cols), jnp.asarray(vals),
                        jnp.asarray(valid), nc, diag=jnp.asarray(diag),
                        mxu=True, use_pallas=False)
    assert sop.mxu and sop.block == 128
    uop, ovf = blockdense_from_ell(jnp.asarray(cols), jnp.asarray(vals),
                                   jnp.asarray(valid), nc,
                                   diag=jnp.asarray(diag), block=8,
                                   window=128, nw=14, escape_cap=8192,
                                   window0=128)
    assert not bool(ovf)
    y_u = np.asarray(blockdense_matvec(uop, jnp.asarray(x)))
    y_m = np.asarray(slab_matvec(sop, jnp.asarray(x)))
    scale = np.abs(y_u).max()
    np.testing.assert_allclose(y_m, y_u, atol=2e-6 * scale)

    from gravomg_tpu.ops.pallas_blockdense import mxu_matvec_pallas
    from gravomg_tpu.ops.slab import _bucket_escape
    parts = []
    for b in sop.buckets:
        y = mxu_matvec_pallas(b.m, b.win_start // 128, jnp.asarray(x),
                              b.m.shape[0] * 128, interpret=True)
        parts.append(np.asarray(_bucket_escape(b, y, jnp.asarray(x)))
                     .reshape(-1, 128))
    ycat = np.concatenate(parts)
    y_p = (ycat[np.asarray(sop.inv_block_perm)].reshape(-1)[:r]
           + diag * x[:r])
    np.testing.assert_allclose(y_p, y_u, atol=2e-6 * scale)


def test_pick_group_satisfies_mosaic_blockspec_rules():
    """Regression for the 1M launch fault: every auto-chosen group must
    give a Mosaic-legal blocked out spec -- group divides nblk AND
    (group % 8 == 0 or group == nblk)."""
    from gravomg_tpu.ops.pallas_blockdense import pick_group

    cases = [(n, bpb, bud)
             for n in list(range(1, 21)) + [33, 69, 97, 276, 2208,
                                            8200, 43003]
             for bpb in (8 * 128 * 4, 256 * 1408 * 4, 2 * 65536)
             for bud in (1 << 19, 1 << 20)]
    for nblk, bytes_per_block, budget in cases:
        gp = pick_group(nblk, bytes_per_block, budget)
        assert nblk % gp == 0, (nblk, gp)
        assert gp % 8 == 0 or gp == nblk, (nblk, gp)
    # The shape that faulted the first 1M run (2208 blocks of (8, 128))
    # must come out blocked, not whole-array (whole-array was the
    # 22 MB scoped-VMEM OOM at 43k blocks).
    gp = pick_group(2208, 8 * 128 * 4, 1 << 19)
    assert gp % 8 == 0 and gp < 2208


def test_pallas_whole_array_group_fallback(rng):
    """nblk with no multiple-of-8 divisor exercises the group == nblk
    fallback end-to-end (interpret mode)."""
    r = nc = 328                       # 41 blocks of 8: 41 is prime
    cols, vals, valid = _tailed_ell(rng, r=r, k=6, nc=nc)
    x = rng.normal(size=nc).astype(np.float32)
    bop, _overflow = blockdense_from_ell(
        jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(valid), nc,
        block=8, window=128, align=128)
    from gravomg_tpu.ops.pallas_blockdense import (blockdense_matvec_pallas,
                                                   pick_group)
    assert pick_group(41, bop.m.shape[1] * bop.m.shape[2] * 4,
                      1 << 19) == 41
    y_ref = np.asarray(blockdense_matvec(bop, jnp.asarray(x)))
    y_p = np.asarray(blockdense_matvec_pallas(bop, jnp.asarray(x),
                                              interpret=True))
    np.testing.assert_allclose(y_p, y_ref, atol=1e-6 * np.abs(y_ref).max())

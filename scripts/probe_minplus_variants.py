"""In-loop (scan-slope) timing of min-plus round variants at 1M.

The standalone-launch numbers mislead (the degraded ~48 ms dispatch tax
dwarfs kernel differences), so each variant here runs as a 2-round vs
10-round lax.scan and reports the per-round slope -- exactly how the
sampler consumes the kernel.

Variants:
  v0: shipped round (two blockdense_minplus2 as committed)
  v1: two-step reduction: 5-way minimum chain over 128-wide window
      groups, then one 128-lane min
  v2: v1 + escape path as fixed-width ELL (prebuilt from esc arrays)
      instead of 2M-element gathers + scatter segment_min

Usage: python scripts/probe_minplus_variants.py [n=1000000]
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import gravomg_tpu as g
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.coarsen.sampling import (sampling_radius, _SELECTED,
                                          _UNDECIDED, _REJECTED)
from gravomg_tpu.coarsen.parents import graph_minplus_operator
from gravomg_tpu.ops import blockdense as B
from gravomg_tpu.ops.segment import build_ell_rows

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def probe(x):
    return float(jnp.sum(jnp.ravel(
        jax.tree_util.tree_leaves(x)[0])[:4].astype(jnp.float32)))


def main():
    pts = torus_points(N, seed=1).astype(np.float32)
    pts = pts[morton_order(pts)]
    graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
    assert not bool(short)
    radius = jnp.float32(sampling_radius(
        graph, g.MultigridConfig().reduction_ratio))
    bd, _ = graph_minplus_operator(graph)
    jax.block_until_ready(bd.m)
    v = graph.num_vertices
    nblk, rows, nww = bd.m.shape
    print(f"n={N} m={bd.m.shape} esc={bd.esc_w.shape[0]}", flush=True)

    perm = jax.random.permutation(jax.random.PRNGKey(0), v)
    pr = jax.lax.bitcast_convert_type(
        perm.astype(jnp.int32) + jnp.int32(2 ** 23), jnp.float32)

    # Escape-ELL: group the (row-sorted) escape entries into a fixed
    # width table.  E covers p~all rows; overflow flagged (a real
    # integration would fall back for flagged rows).
    E = 8
    r_ = bd.n_rows
    eres = build_ell_rows(jnp.minimum(bd.esc_rows, r_),
                          jnp.minimum(bd.esc_cols, bd.n_cols - 1),
                          bd.esc_w < jnp.inf, r_, E,
                          values=bd.esc_w, combine="min")
    print(f"escape ELL: width {E} overflow={bool(eres.overflow)} "
          f"maxcount={int(jnp.max(eres.counts))}", flush=True)
    esc_cols = jnp.where(eres.columns == np.iinfo(np.int32).max, 0,
                         eres.columns)
    esc_w = eres.values      # combine="min" pads absent slots with +inf

    def mp2_v1(bd_, ecols_, ew_, x_dist, x_pri, thresh, use_ell):
        m = bd_.m
        wd = B._gather_windows(bd_, jnp.where(jnp.isinf(x_dist), jnp.inf,
                                              x_dist))
        wp = B._gather_windows(bd_, x_pri)
        md = m + wd
        mp = jnp.where(m < thresh, wp, jnp.asarray(jnp.inf, jnp.float32))
        # two-step reduction: 128-wide group minimum chain, then one
        # lane min.
        g4 = md.reshape(nblk, rows, nww // 128, 128)
        p4 = mp.reshape(nblk, rows, nww // 128, 128)
        gd = g4[:, :, 0, :]
        gp = p4[:, :, 0, :]
        for k in range(1, nww // 128):
            gd = jnp.minimum(gd, g4[:, :, k, :])
            gp = jnp.minimum(gp, p4[:, :, k, :])
        yd = jnp.min(gd, axis=-1).reshape(-1)[:r_]
        yp = jnp.min(gp, axis=-1).reshape(-1)[:r_]
        if use_ell:
            for e in range(E):
                ce = ecols_[:, e]
                we = ew_[:, e]
                yd = jnp.minimum(yd, we + x_dist[ce])
                yp = jnp.minimum(yp, jnp.where(we < thresh, x_pri[ce],
                                               jnp.inf))
        else:
            seg = jnp.minimum(bd_.esc_rows, r_)
            col = jnp.minimum(bd_.esc_cols, bd_.n_cols - 1)
            cd = bd_.esc_w + x_dist[col]
            cp = jnp.where(bd_.esc_w < thresh, x_pri[col], jnp.inf)
            yd = jnp.minimum(yd, jax.ops.segment_min(
                cd, seg, num_segments=r_ + 1,
                indices_are_sorted=True)[:r_])
            yp = jnp.minimum(yp, jax.ops.segment_min(
                cp, seg, num_segments=r_ + 1,
                indices_are_sorted=True)[:r_])
        return yd, yp

    def make_round(kind, bd_, ecols_, ew_, pr_, rad_):
        def round_body(status, _):
            y = jnp.where(status == _SELECTED, 0.0, jnp.inf)
            gpr = jnp.where(status == _UNDECIDED, pr_, jnp.inf)
            if kind == "v0":
                r1, u1 = B.blockdense_minplus2(bd_, y, gpr, rad_)
                r2, u2 = B.blockdense_minplus2(bd_, r1,
                                               jnp.minimum(u1, gpr),
                                               rad_)
            else:
                use_ell = kind == "v2"
                r1, u1 = mp2_v1(bd_, ecols_, ew_, y, gpr, rad_, use_ell)
                r2, u2 = mp2_v1(bd_, ecols_, ew_, r1,
                                jnp.minimum(u1, gpr), rad_, use_ell)
            sel = (r1 < rad_) | (r2 < rad_)
            und = status == _UNDECIDED
            new = jnp.where(und & sel, _REJECTED,
                            jnp.where(und & ~(u2 < pr_), _SELECTED,
                                      status)).astype(jnp.int8)
            return new, None
        return round_body

    @functools.partial(jax.jit, static_argnames=("kind", "k"))
    def k_rounds_impl(bd_, ecols_, ew_, prs, rad_, kind, k):
        st, _ = jax.lax.scan(make_round(kind, bd_, ecols_, ew_, prs, rad_),
                             jnp.zeros((v,), jnp.int8), None, length=k)
        return st

    def k_rounds(prs, kind, k):
        return k_rounds_impl(bd, esc_cols, esc_w, prs, radius, kind, k)

    results = {}
    for kind in ("v0", "v1", "v2"):
        ts = {}
        for k in (2, 10):
            st = k_rounds(pr, kind, k)
            probe(st)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                probe(k_rounds(pr, kind, k))
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        slope = (ts[10] - ts[2]) / 8 * 1000
        results[kind] = (st, slope)
        print(f"{kind}: per-round slope = {slope:.2f} ms", flush=True)

    # Equivalence: final status identical (min-plus is order-exact;
    # the ELL escape groups the same entries).
    s0 = np.asarray(k_rounds(pr, "v0", 10))
    for kind in ("v1", "v2"):
        sk = np.asarray(k_rounds(pr, kind, 10))
        print(f"{kind} status equal v0: {bool((s0 == sk).all())}",
              flush=True)


if __name__ == "__main__":
    main()

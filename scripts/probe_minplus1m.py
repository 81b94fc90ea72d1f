"""Why does one blockdense_minplus2 cost 135 ms at 1M (m = 2.56 GB)?

Bandwidth says ~10-15 ms.  Times the kernel's components in isolation:
the variadic lax.reduce vs two plain jnp.min reductions, the window
gathers, the escape segment_min, and a bf16-m variant.

Usage: python scripts/probe_minplus1m.py [n=1000000]
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
from gravomg_tpu.coarsen.sampling import sampling_radius
from gravomg_tpu.coarsen.parents import graph_minplus_operator
from gravomg_tpu.ops import blockdense as B

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def probe(x):
    return float(jnp.sum(jnp.ravel(
        jax.tree_util.tree_leaves(x)[0])[:4].astype(jnp.float32)))


def timed(name, fn, reps=3):
    out = fn()
    probe(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        probe(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1000:10.2f} ms", flush=True)
    return out


def main():
    pts = torus_points(N, seed=1).astype(np.float32)
    pts = pts[morton_order(pts)]
    graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
    assert not bool(short)
    radius = jnp.float32(sampling_radius(graph,
                                         g.MultigridConfig().reduction_ratio))
    bd, _ = graph_minplus_operator(graph)
    jax.block_until_ready(bd.m)
    v = graph.num_vertices
    print(f"n={N} m={bd.m.shape} {bd.m.dtype} "
          f"bytes={bd.m.size * bd.m.dtype.itemsize / 1e9:.2f} GB "
          f"esc={bd.esc_w.shape[0]}", flush=True)

    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0.1, 1.0, v).astype(np.float32))
    xp = jnp.asarray(np.random.default_rng(1)
                     .uniform(0.1, 1.0, v).astype(np.float32))

    mp2 = jax.jit(B.blockdense_minplus2)
    mp1 = jax.jit(B.blockdense_minplus)
    timed("shipped blockdense_minplus2",
          lambda: mp2(bd, x, xp, radius))
    timed("shipped blockdense_minplus (single)",
          lambda: mp1(bd, x))

    @jax.jit
    def gathers_only(bd_, x_):
        return B._gather_windows(bd_, x_)

    timed("_gather_windows alone", lambda: gathers_only(bd, x))

    @jax.jit
    def two_plain_mins(bd_, x_, xp_, r_):
        wd = B._gather_windows(bd_, x_)
        wp = B._gather_windows(bd_, xp_)
        yd = jnp.min(bd_.m + wd, axis=-1)
        yp = jnp.min(jnp.where(bd_.m < r_, wp, jnp.inf), axis=-1)
        return yd, yp

    timed("two plain jnp.min reductions",
          lambda: two_plain_mins(bd, x, xp, radius))

    @jax.jit
    def one_plain_min(bd_, x_):
        wd = B._gather_windows(bd_, x_)
        return jnp.min(bd_.m + wd, axis=-1)

    timed("one plain jnp.min (m + wd)", lambda: one_plain_min(bd, x))

    @jax.jit
    def min_m_only(bd_):
        return jnp.min(bd_.m, axis=-1)

    timed("jnp.min(m) no gather", lambda: min_m_only(bd))

    @jax.jit
    def esc_only(bd_, x_, r_):
        r = bd_.n_rows
        seg = jnp.minimum(bd_.esc_rows, r)
        col = jnp.minimum(bd_.esc_cols, bd_.n_cols - 1)
        cd = bd_.esc_w + x_[col]
        return jax.ops.segment_min(cd, seg, num_segments=r + 1,
                                   indices_are_sorted=True)[:r]

    timed("escape segment_min alone", lambda: esc_only(bd, x, radius))

    # bf16 m variant (sampling-only candidate).
    bd16 = bd._replace(m=bd.m.astype(jnp.bfloat16))
    jax.block_until_ready(bd16.m)

    @jax.jit
    def two_mins_bf16(bd_, x_, xp_, r_):
        wd = B._gather_windows(bd_, x_.astype(jnp.bfloat16))
        wp = B._gather_windows(bd_, xp_)
        yd = jnp.min(bd_.m + wd, axis=-1)
        yp = jnp.min(jnp.where(bd_.m < r_, wp, jnp.inf), axis=-1)
        return yd, yp

    timed("two plain mins, bf16 m",
          lambda: two_mins_bf16(bd16, x, xp, radius))
    timed("shipped minplus2, bf16 m",
          lambda: mp2(bd16, x, xp, radius))


if __name__ == "__main__":
    main()

"""Banded vs ELL SpMV on the real bench operator at TPU scale.

Usage: python scripts/profile_banded.py [V]
"""

import functools
import os
import sys
import time

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
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.ops.banded import banded_from_ell, banded_spmv
from gravomg_tpu.solve.spmv import spmv

V = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

pts = torus_points(V, seed=1).astype(np.float32)
pts = pts[morton_order(pts)]
graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
lap, mass = g.graph_laplacian(graph, "invdist")
op = lap._replace(diag=lap.diag + 0.5 * mass)
x0 = jnp.asarray(np.random.default_rng(0).normal(size=V), jnp.float32)


def slope_ms(make_fn, arg, n1=3, n2=23, reps=3):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(a, iters):
        def body(_, a):
            return make_fn(a)
        return jax.lax.fori_loop(0, iters, body, a)

    def timed(iters):
        out = run(arg, iters)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(arg, iters)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1) * 1000.0


print(f"# V={V} K={graph.max_degree}", flush=True)
print(f"{'ell_spmv':24s} {slope_ms(lambda x: spmv(op, x) * 1e-3 + x, x0):9.3f} ms",
      flush=True)

for (w, blk, win, nw) in ((64, 16, 256, 2), (128, 16, 256, 2),
                          (128, 16, 256, 4), (128, 8, 256, 3),
                          (256, 16, 512, 2)):
    bop, ovf = banded_from_ell(op, half_width=w, block=blk, window=win,
                               nw=nw, escape_cap=V)
    n_esc = int(jnp.sum(bop.esc_w != 0.0))
    n_far = int(jnp.sum(bop.far_sel >= 0))
    assert not bool(ovf), (w, blk, win, nw)
    name = f"banded W={w} win={win} nw={nw}"
    t = slope_ms(lambda x, b=bop: banded_spmv(b, x) * 1e-3 + x, x0)
    print(f"{name:24s} {t:9.3f} ms  (far={n_far} esc={n_esc})", flush=True)

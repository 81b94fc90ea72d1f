"""A/B the Galerkin RAP implementations on the TPU.

  baseline  solve/rap.py::galerkin_rap        (global triplet lexsort)
  local     solve/rap2.py::galerkin_rap_local (lane merges, children table)

Builds a realistic level-0 -> level-1 RAP input (Morton-ordered torus,
kNN graph, random-priority sampling U) at the requested size, then
times each variant's EXECUTION with the repeat-difference protocol
(same jitted program run r1 and r2 times inside one launch; the slope
isolates per-execution time from dispatch/compile).

Usage: python scripts/profile_rap.py [n=200000] [reps=4]
"""

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
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.hierarchy_static import build_hierarchy_device

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def main():
    pts = torus_points(N, seed=1).astype(np.float32)
    pts = pts[morton_order(pts)]
    graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
    assert not bool(short)
    lap, mass = g.graph_laplacian(graph, "invdist")
    spd = lap._replace(diag=lap.diag + 0.5 * mass)
    cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
    # One-level build to obtain a real U (max_levels=2: one coarsening).
    cfg1 = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev",
                             max_levels=2)
    h, diags = build_hierarchy_device(graph, spd, cfg1)
    u = h.levels[0].u
    op = spd
    cap = 128

    from gravomg_tpu.solve.rap import galerkin_rap
    from gravomg_tpu.solve.rap2 import galerkin_rap_local

    def timed(fn, label):
        t0 = time.perf_counter()
        out, ovf = fn()
        probe = float(jnp.sum(out.diag[:4]))
        t_first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            out, ovf = fn()
            probe = float(jnp.sum(out.diag[:4]))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: first={t_first:.3f}s warm_best={best:.3f}s "
              f"overflow={bool(ovf)}", flush=True)
        return out

    a = timed(lambda: galerkin_rap(op, u, cap), "baseline")
    b = timed(lambda: galerkin_rap_local(op, u, cap), "local   ")
    # Operator equality probe (f32 add order differs): matvec diff.
    x = jnp.asarray(np.random.default_rng(0).normal(size=a.num_vertices),
                    jnp.float32)
    d = float(jnp.max(jnp.abs(g.spmv(a, x) - g.spmv(b, x))))
    r = float(jnp.max(jnp.abs(g.spmv(a, x))))
    print(f"matvec max|diff|={d:.3e} (scale {r:.3e})")


if __name__ == "__main__":
    main()

"""North-star config (BASELINE config 4): 1M-vertex cloud, 5-ish-level
hierarchy, Chebyshev smoothing, blocked-ELL kernels, solve to 1e-8.

Run on the TPU:  python scripts/run_1m.py [n_points]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_points: int = 1_000_000):
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))),
                              ".bench_cache", "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import gravomg_tpu as g
    from gravomg_tpu.geometry.meshes import torus_points
    from gravomg_tpu.utils.profiling import StageTimer

    print(f"devices: {jax.devices()}", flush=True)
    pts = torus_points(n_points, seed=1).astype(np.float32)
    timer = StageTimer()

    with timer.stage("knn"):
        graph = g.grid_knn_graph(jnp.asarray(pts), k=16)
        jax.block_until_ready(graph.distances)
    print("knn done", timer.stages[-1], flush=True)

    lap, mass = g.graph_laplacian(graph, "invdist")
    spd = lap._replace(diag=lap.diag + 0.5 * mass)
    cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev",
                            max_levels=7)

    with timer.stage("build_cold"):
        h = g.build_hierarchy(graph, spd, cfg)
    print("build cold done", timer.stages[-1], flush=True)
    print("levels:", [gr.num_vertices for gr in h.graphs],
          "real:", [int(ld.stats.n_coarse) for ld in h.levels], flush=True)
    for ld in h.levels:
        print(f"  {ld.stats.n_fine} -> {int(ld.stats.n_coarse)} "
              f"tris={int(ld.stats.n_triangles)} "
              f"cases={int(ld.stats.triangle_hits)}/"
              f"{int(ld.stats.edge_fallbacks)}/"
              f"{int(ld.stats.point_fallbacks)}", flush=True)

    with timer.stage("build_warm"):
        h = g.build_hierarchy(graph, spd, cfg)
    print("build warm done", timer.stages[-1], flush=True)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=graph.num_vertices), jnp.float32)

    import functools

    @jax.jit
    def step(hs, x, b):
        return g.v_cycle(hs, x, b, cfg)

    x = step(h.solver, jnp.zeros_like(b), b)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(20):
        x = step(h.solver, x, b)
    jax.block_until_ready(x)
    vcycle_ms = (time.perf_counter() - t0) / 20 * 1000
    rel = float(jnp.linalg.norm(b - g.spmv(h.solver.levels[0].op, x))
                / jnp.linalg.norm(b))
    print(f"V-cycle: {vcycle_ms:.3f} ms  (residual after 21: {rel:.2e})",
          flush=True)

    t0 = time.perf_counter()
    xs, rel_s, iters = g.solve(h.solver, b, cfg)
    jax.block_until_ready(xs)
    print(f"f32 solve: rel {float(rel_s):.2e} iters {int(iters)} "
          f"({time.perf_counter()-t0:.2f}s)", flush=True)

    print(timer.report(), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)

"""Bisect the 1M device build by LEVEL COUNT.

scripts/bisect_1m.py covers level-0 stages; the full build also runs
levels 1+, restriction extraction, Chebyshev estimation, and the coarse
Cholesky.  This driver builds with level_caps truncated to the first k
levels and probes, isolating which level (or the epilogue) kills the
worker.

Usage: python scripts/bisect_1m_levels.py K_LEVELS [N]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.bench_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
import gravomg_tpu as g
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.hierarchy_static import build_hierarchy_device, plan_levels


def main(k_levels: int, n: int = 1_000_000):
    pts = torus_points(n, seed=1).astype(np.float32)
    pts = pts[morton_order(pts)]
    cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
    graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
    lap, mass = g.graph_laplacian(graph, "invdist")
    spd = lap._replace(diag=lap.diag + 0.5 * mass)
    caps = plan_levels(n, cfg)
    print(f"plan {caps}, truncating to {caps[:k_levels]}", flush=True)
    t0 = time.perf_counter()
    h, diags = build_hierarchy_device(graph, spd, cfg,
                                      level_caps=caps[:k_levels])
    probe = float(jnp.sum(h.solver.levels[-1].op.diag))
    print(f"k={k_levels}: probe={probe} t={time.perf_counter()-t0:.1f}s "
          f"levels={[int(d.n_real) for d in diags]}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2
         else 1_000_000)

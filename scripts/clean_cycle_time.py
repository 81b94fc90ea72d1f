"""Measure N V-cycles in a single launch WITHOUT prior D2H.

Protocol: build hierarchy (no sync), sleep to let the device queue
drain (block_until_ready is unreliable here), then time one fori-loop
program closed by its first D2H readout.  Run in a fresh process per N:
    python scripts/clean_cycle_time.py N [n_points] [sleep_s]
"""

import functools
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.bench_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
import gravomg_tpu as g  # noqa: E402
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync  # noqa
from gravomg_tpu.geometry.meshes import torus_points  # noqa
from gravomg_tpu.hierarchy_static import build_hierarchy_device  # noqa


def main(cycles: int, n: int = 200000, sleep_s: float = 150.0):
    pts = torus_points(n, seed=1).astype(np.float32)
    cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
    graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
    lap, mass = g.graph_laplacian(graph, "invdist")
    spd = lap._replace(diag=lap.diag + 0.5 * mass)
    h, diags = build_hierarchy_device(graph, spd, cfg)
    b = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_cycles(hs, b, k):
        return jax.lax.fori_loop(
            0, k, lambda _, x: g.v_cycle(hs, x, b, cfg),
            jnp.zeros_like(b))

    # AOT-compile without executing.
    lowered = run_cycles.lower(h.solver, b, k=cycles)
    compiled = lowered.compile()
    print("compiled; draining queue", flush=True)
    time.sleep(sleep_s)

    t0 = time.perf_counter()
    x = compiled(h.solver, b)
    v = float(jnp.sum(x[:4]))     # first D2H: the completion barrier
    t = time.perf_counter() - t0
    print(f"CLEAN T({cycles}) at {n}v: {t:.3f} s   (probe {v:.4g})",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]),
         int(sys.argv[2]) if len(sys.argv) > 2 else 200000,
         float(sys.argv[3]) if len(sys.argv) > 3 else 150.0)

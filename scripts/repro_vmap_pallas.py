"""Bisect the round-3 c5 TPU-worker crash: vmapped Mosaic slab kernels.

Hypothesis: `jax.vmap(v_cycle)` over a batch of RHS routes the 1-D
slab matvec (ops/pallas_blockdense.py) through Mosaic's vmap batching,
which kernel-faults the worker.  This script isolates it: one 8k mesh
(above attach_slab_operators' min_rows), then

  1. single-RHS V-cycle (baseline, known good),
  2. vmapped V-cycle over 4 RHS with the PALLAS slab form,
  3. same with the XLA slab form (use_pallas=False),
  4. same with uniform block-dense only.

Run stages individually to bracket the fault:
  python scripts/repro_vmap_pallas.py 1 2     # etc.
Prints one JSON line per stage; a worker crash kills the process at
the offending stage, which is the attribution.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
import gravomg_tpu as g
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.hierarchy_static import (build_hierarchy_device,
                                          check_diagnostics,
                                          compact_solver)

N = 8192
cfg = g.MultigridConfig(coarse_threshold=600, smoother="chebyshev")


def emit(obj):
    print(json.dumps(obj), flush=True)


def build(use_pallas, slab):
    pts = torus_points(N, seed=4)
    pts = pts[morton_order(pts)].astype(np.float32)
    graph, short = grid_knn_graph_nosync(pts, 12, margin=2.4)
    assert not bool(short)
    spd, _ = g.screened_poisson_operator(graph, alpha="auto")
    h, diags = build_hierarchy_device(graph, spd, cfg)
    check_diagnostics(diags)
    sol = compact_solver(h.solver, diags)
    if slab:
        sol = g.attach_slab_operators(sol, use_pallas=use_pallas,
                                      min_rows=4096)
    sol = g.attach_fast_operators(sol)
    return sol


def run(stage):
    t0 = time.perf_counter()
    if stage == 1:
        sol = build(use_pallas=None, slab=True)
        b = jnp.ones((N,), jnp.float32)
        x = jax.jit(lambda s, b: g.v_cycle(s, jnp.zeros_like(b), b,
                                           cfg))(sol, b)
        probe = float(jnp.sum(x[:4]))
    elif stage in (2, 3, 4):
        sol = build(use_pallas=(None if stage == 2 else False),
                    slab=stage != 4)
        bs = jnp.ones((4, N), jnp.float32)
        f = jax.jit(lambda s, bs: jax.vmap(
            lambda b: g.v_cycle(s, jnp.zeros_like(b), b, cfg))(bs))
        x = f(sol, bs)
        probe = float(jnp.sum(x[:, :4]))
    emit({"stage": stage, "ok": True, "probe": probe,
          "t_s": round(time.perf_counter() - t0, 2)})


if __name__ == "__main__":
    for s in (sys.argv[1:] or ["1", "2", "3", "4"]):
        emit({"stage": int(s), "starting": True})
        run(int(s))

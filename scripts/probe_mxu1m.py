"""L0 matvec shoot-out at scale: VPU slab vs MXU transposed-tile slab,
f32 vs bf16 (VERDICT r5 #8).

The r3 MXU verdict (3.6x more bytes, no faster, ~1e-3 error) was taken
at f32, where the MXU rounds through bf16 anyway.  bf16 M halves the
byte penalty and doubles MXU throughput; if the cycle is
bandwidth-bound after the overhead work, this is the next 2x on the
preconditioner path (the bf16-FCG default at 1M).  This probe measures
the per-matvec slope of every (format, dtype) pair on the 1M fine
level plus accuracy vs the exact ELL SpMV.

Usage: python scripts/probe_mxu1m.py [N]
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
jax.config.update("jax_compilation_cache_dir", ".bench_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import gravomg_tpu as g
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.hierarchy_static import (build_hierarchy_device,
                                          check_diagnostics,
                                          compact_solver)
from gravomg_tpu.ops.slab import slab_from_operator, slab_matvec
from gravomg_tpu.solve.spmv import spmv

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
R1, R2 = 5, 45

cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
pts = torus_points(N, seed=1).astype(np.float32)
pts = pts[morton_order(pts)]
graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
assert not bool(short)
spd, _ = g.screened_poisson_operator(graph, alpha="auto")
h, diags = build_hierarchy_device(graph, spd, cfg)
probe = float(jnp.sum(h.solver.levels[-1].op.diag))
check_diagnostics(diags)
sol = compact_solver(h.solver, diags)
op0 = sol.levels[0].op
h = None
import gc
gc.collect()

b = jnp.asarray(np.random.default_rng(0).normal(size=N), jnp.float32)
ref = np.asarray(spmv(op0, b))
ref_norm = float(np.linalg.norm(ref))


def slope(mv, slab, tag):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(s, x, reps):
        def body(i, y):
            # Renormalize so the iterate stays finite over R2 matvecs.
            return mv(s, y / jnp.maximum(jnp.linalg.norm(y), 1e-30))
        return jax.lax.fori_loop(0, reps, body, x)

    def once(reps):
        y = run(slab, b, reps)
        float(jnp.sum(y[:4]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = run(slab, b, reps)
            float(jnp.sum(y[:4]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = once(R1), once(R2)
    ms = (t2 - t1) / (R2 - R1) * 1000
    err = float(np.linalg.norm(np.asarray(mv(slab, b)) - ref) / ref_norm)
    mb = slab.m_bytes / 1e6
    gbps = slab.m_bytes / (ms * 1e-3) / 1e9
    print(f"# {tag}: {ms:.3f} ms/matvec  rel_err={err:.2e} "
          f"M={mb:.0f} MB  ({gbps:.0f} GB/s on M)", flush=True)
    return {"ms": ms, "rel_err": err, "m_mb": mb, "gbps": gbps}


out = {"n": N}
for mxu in (False, True):
    for dt in (jnp.float32, jnp.bfloat16):
        tag = f"{'mxu' if mxu else 'vpu'}_{jnp.dtype(dt).name}"
        try:
            slab = slab_from_operator(op0, dtype=dt, mxu=mxu)
        except ValueError as e:
            print(f"# {tag}: build failed: {e}", flush=True)
            out[tag] = {"error": str(e)}
            continue
        out[tag] = slope(slab_matvec, slab, tag)
        del slab
        gc.collect()

json.dump(out, open("scripts/probe_mxu1m_out.json", "w"), indent=1)
print("# wrote scripts/probe_mxu1m_out.json", flush=True)

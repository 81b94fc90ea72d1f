"""Micro-profile the V-cycle at bench scale: per-piece slope timings.

Isolates each component of a V-cycle (per-level SpMV, smoother,
restrict, prolong, coarse solve) using the same single-launch
fori_loop slope protocol as bench.py, so the constant per-launch
dispatch cost cancels and the numbers are true per-op execution times.

Usage:  python scripts/profile_vcycle.py [n_vertices]
Prints one line per piece: name, per-iteration ms, level shapes.
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
from gravomg_tpu.hierarchy_static import (build_hierarchy_device,
                                          check_diagnostics,
                                          compact_solver)
from gravomg_tpu.solve.spmv import spmv
from gravomg_tpu.solve.smoothers import chebyshev
from gravomg_tpu.solve.coarse import coarse_solve
from gravomg_tpu.solve.vcycle import level_matvec
from gravomg_tpu.ops.blockdense import blockdense_matvec
from gravomg_tpu.prolong.operator import prolong, restrict

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

pts = torus_points(N, seed=1).astype(np.float32)
pts = pts[morton_order(pts)]
cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
lap, mass = g.graph_laplacian(graph, "invdist")
spd = lap._replace(diag=lap.diag + 0.5 * mass)
h, diags = build_hierarchy_device(graph, spd, cfg)
probe = float(jnp.sum(h.solver.levels[-1].op.diag))
check_diagnostics(diags)
# Same operator stack as the headline bench: bucketed slab kernels on
# the large levels, uniform block-dense on the rest.
sol = g.attach_fast_operators(
    g.attach_slab_operators(compact_solver(h.solver, diags)))

shapes = [(l.op.num_vertices, l.op.max_degree) for l in sol.levels]
print(f"# levels (padded V, K): {shapes}", file=sys.stderr)


def slope_ms(make_fn, n1=3, n2=13, reps=3):
    """Per-iteration ms of fn iterated inside one jitted fori_loop.

    ``args0`` is a (x, aux) pair passed as a jit ARGUMENT -- closure
    capture would bake multi-GB operator tables into the HLO as
    constants (observed 2.5 GB captured)."""

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(args, iters):
        x, aux = args
        def body(_, xx):
            return make_fn(xx, aux)
        return jax.lax.fori_loop(0, iters, body, x), aux

    def timed(iters):
        out = run(args0, iters)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(args0, iters)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(n1)
    t2 = timed(n2)
    return (t2 - t1) / (n2 - n1) * 1000.0


results = {}

for i, lvl in enumerate(sol.levels):
    v = lvl.op.num_vertices
    args0 = (jnp.asarray(np.random.default_rng(i).normal(size=v),
                         jnp.float32), lvl)

    def mk_spmv(x, lvl):
        return level_matvec(lvl, x) * 0.5 + x * 1e-6

    results[f"spmv_L{i}"] = slope_ms(mk_spmv)

    if lvl.cheb is not None:
        def mk_cheb(x, lvl):
            import functools as ft
            mv = (ft.partial(level_matvec, lvl)
                  if lvl.banded is not None else None)
            return chebyshev(lvl.op, x, jnp.ones_like(x), lvl.cheb,
                             cfg.chebyshev_degree, mv=mv) * 0.5

        results[f"cheb_L{i}"] = slope_ms(mk_cheb)

for i, lvl in enumerate(sol.levels[:-1]):
    u = lvl.u
    vf = u.n_fine
    nc = u.n_coarse
    fine = jnp.asarray(np.random.default_rng(7).normal(size=vf), jnp.float32)
    coarse = jnp.asarray(np.random.default_rng(8).normal(size=nc),
                         jnp.float32)

    args0 = (fine, lvl)

    def mk_restrict(x, lvl):
        r = blockdense_matvec(lvl.utw, x)
        return x * 0.5 + jnp.zeros_like(x).at[:r.shape[0]].add(r * 1e-9)

    results[f"restrict_L{i}"] = slope_ms(mk_restrict)

    args0 = (coarse, lvl)

    def mk_prolong_back(c, lvl):
        f = blockdense_matvec(lvl.uw, c)
        r = blockdense_matvec(lvl.utw, f)
        return r * 0.25

    results[f"prolong+restrict_L{i}"] = slope_ms(mk_prolong_back)

nclast = sol.levels[-1].op.num_vertices
args0 = (jnp.asarray(np.random.default_rng(9).normal(size=nclast),
                     jnp.float32), sol.coarse_chol)


def mk_coarse(b, chol):
    return coarse_solve(chol, b) * 0.5 + b * 0.1


results["coarse_solve"] = slope_ms(mk_coarse)

# Full V-cycle for cross-check.
b0 = jnp.asarray(np.random.default_rng(0).normal(size=shapes[0][0]),
                 jnp.float32)
args0 = (jnp.zeros_like(b0), sol)


def mk_vc(x, sol):
    return g.v_cycle(sol, x, b0 * 0 + 1.0, cfg)


results["v_cycle_total"] = slope_ms(mk_vc)

for k, v in results.items():
    print(f"{k:24s} {v:10.3f} ms")

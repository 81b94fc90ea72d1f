"""Per-level, per-phase attribution of the 1M V-cycle (VERDICT r5 #3).

The committed headline is 38.7 ms/cycle at 1M while the streamed bytes
say the fine smoother alone should be ~15-20 ms and everything below it
nearly free -- this script measures where the rest goes.

Protocol: every number is an in-loop slope (fori_loop of the probe
inside ONE jit launch, two different trip counts, D2H barrier), the
only protocol that survives this runtime's ~48 ms degraded-dispatch
tax (PROGRESS.md).  Three families:

  * depth-truncated cycles: a modified _descend that returns a zero
    correction below depth d.  t(d+1) - t(d) = the full cost of level
    d+1 (its smoothers, residual, transfers, and its own recursion
    overhead).
  * per-phase loops at each level: chebyshev smooth, A-matvec,
    restrict, prolong, each iterated alone.
  * the coarse direct solve.

Usage: python scripts/profile_cycle1m.py [N] [--reps a,b]
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
from gravomg_tpu.solve.vcycle import (SolverHierarchy, _smooth,
                                      _restrict_level, _prolong_level,
                                      level_matvec)
from gravomg_tpu.solve.coarse import coarse_solve

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
R1, R2 = 3, 13

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
sol = g.attach_slab_operators(sol)
sol = g.attach_fast_operators(sol)
h = None
import gc
gc.collect()

nlev = len(sol.levels)
print(f"# levels: {[l.op.num_vertices for l in sol.levels]}", flush=True)

# Byte accounting for the roofline: each operator form's dense-window
# stream per matvec (the dominant HBM term; x/y/diag add ~12B/row).
for li, lvl in enumerate(sol.levels):
    def mb(o):
        if o is None:
            return None
        try:
            return round(o.m_bytes / 1e6, 1)
        except AttributeError:
            return round(o.m.size * o.m.dtype.itemsize / 1e6, 1)
    print(f"# L{li} m_bytes MB: A={mb(lvl.banded)} U={mb(lvl.uw)} "
          f"Ut={mb(lvl.utw)}", flush=True)

b = jnp.asarray(np.random.default_rng(0).normal(size=N), jnp.float32)


def descend_trunc(hs, lvl, x, bb, max_depth):
    """v_cycle cut at max_depth: levels deeper than max_depth return a
    zero correction (no smoothing, no solve)."""
    level = hs.levels[lvl]
    if lvl == len(hs.levels) - 1:
        return coarse_solve(hs.coarse_chol, bb)
    x = _smooth(level, x, bb, cfg.pre_smooth, cfg)
    r = bb - level_matvec(level, x)
    rc = _restrict_level(level, r, True)
    if lvl + 1 > max_depth:
        ec = jnp.zeros_like(rc)
    else:
        ec = descend_trunc(hs, lvl + 1, jnp.zeros_like(rc), rc,
                           max_depth)
    x = x + _prolong_level(level, ec, True)
    return _smooth(level, x, bb, cfg.post_smooth, cfg)


def slope(make_body, tag):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(hs, bb, reps):
        body = make_body(hs, bb)
        return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(bb))

    def once(reps):
        x = run(sol, b, reps)
        float(jnp.sum(x[:4]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            x = run(sol, b, reps)
            float(jnp.sum(x[:4]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = once(R1), once(R2)
    ms = (t2 - t1) / (R2 - R1) * 1000
    print(f"# {tag}: {ms:.3f} ms  (T{R1}={t1:.4f}s T{R2}={t2:.4f}s)",
          flush=True)
    return ms


out = {"n": N, "levels": [l.op.num_vertices for l in sol.levels]}

# 1. Depth-truncated cycles.
depth_ms = []
for d in range(nlev):
    ms = slope(lambda hs, bb, d=d: (
        lambda i, x: descend_trunc(hs, 0, x, bb, d)),
        f"cycle_depth<={d}")
    depth_ms.append(ms)
out["depth_ms"] = depth_ms
out["per_level_marginal_ms"] = [depth_ms[0]] + [
    depth_ms[i] - depth_ms[i - 1] for i in range(1, nlev)]
print(f"# per-level marginal: {out['per_level_marginal_ms']}", flush=True)

# 2. Per-phase loops at each level.
phases = {}
for li in range(nlev - 1):
    lvl = sol.levels[li]
    v = lvl.op.num_vertices

    bl = jnp.asarray(np.random.default_rng(li).normal(size=v),
                     jnp.float32)

    # Phase loops carry the level vector itself as the fori_loop state.
    def make_phase(fn, vec):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def run(hs, reps):
            def body(i, x):
                return fn(hs, x)
            return jax.lax.fori_loop(0, reps, body, vec)
        def once(reps):
            x = run(sol, reps)
            float(jnp.sum(jnp.ravel(x)[:4]))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                x = run(sol, reps)
                float(jnp.sum(jnp.ravel(x)[:4]))
                best = min(best, time.perf_counter() - t0)
            return best
        t1, t2 = once(R1), once(R2)
        return (t2 - t1) / (R2 - R1) * 1000

    ms_smooth = make_phase(
        lambda hs, x, li=li, bl=bl: _smooth(hs.levels[li], x, bl,
                                            cfg.pre_smooth, cfg), bl)
    ms_mv = make_phase(
        lambda hs, x, li=li: level_matvec(hs.levels[li], x), bl)
    ms_tr = make_phase(
        lambda hs, x, li=li, bl=bl: _prolong_level(
            hs.levels[li], _restrict_level(hs.levels[li], bl, True),
            True), bl)
    phases[li] = {"v": v, "smooth_ms": ms_smooth, "matvec_ms": ms_mv,
                  "restrict+prolong_ms": ms_tr}
    print(f"# L{li} v={v}: smooth={ms_smooth:.3f} mv={ms_mv:.3f} "
          f"U^T+U={ms_tr:.3f}", flush=True)

# 3. Coarse solve.
vl = sol.levels[-1].op.num_vertices
bl = jnp.asarray(np.random.default_rng(9).normal(size=vl), jnp.float32)


@functools.partial(jax.jit, static_argnames=("reps",))
def run_cs(hs, reps):
    def body(i, x):
        return coarse_solve(hs.coarse_chol, x)
    return jax.lax.fori_loop(0, reps, body, bl)


def once_cs(reps):
    x = run_cs(sol, reps)
    float(jnp.sum(x[:4]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x = run_cs(sol, reps)
        float(jnp.sum(x[:4]))
        best = min(best, time.perf_counter() - t0)
    return best


t1, t2 = once_cs(R1), once_cs(R2)
out["coarse_solve_ms"] = (t2 - t1) / (R2 - R1) * 1000
print(f"# coarse_solve: {out['coarse_solve_ms']:.3f} ms", flush=True)
out["phases"] = phases

json.dump(out, open("scripts/profile_cycle1m_out.json", "w"), indent=1)
print("# wrote scripts/profile_cycle1m_out.json", flush=True)

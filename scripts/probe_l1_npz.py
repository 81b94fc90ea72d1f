"""Why does L1 cost 9.65 ms of the 1M cycle when its bytes say 3.2?

Loads the exported 1M compacted solver (.bench_cache/solver_v3_*.npz,
written by bench.py -- no 100 s rebuild) and measures depth-truncated
cycle slopes under different MID-LEVEL operator forms:

  A  default attach: slab everywhere >= 4096 rows (pallas kernels)
  B  slab on L0 only; uniform block-dense (XLA) on L1+
  C  slab with use_pallas=False (XLA row-gather form) on all levels

The L1 marginal (depth<=1 minus depth<=0) isolates the mid-level cost
per form.  Usage: python scripts/probe_l1_npz.py [npz] [N]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
jax.config.update("jax_compilation_cache_dir", ".bench_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import gravomg_tpu as g
from gravomg_tpu.io.serialization import load_solver
from gravomg_tpu.solve.vcycle import (_smooth, _restrict_level,
                                      _prolong_level, level_matvec)
from gravomg_tpu.solve.coarse import coarse_solve

NPZ = sys.argv[1] if len(sys.argv) > 1 else \
    ".bench_cache/solver_v3_1000000.npz"
cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
R1, R2 = 3, 13

base = load_solver(NPZ)
n = base.levels[0].op.num_vertices
b = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)
print(f"# levels: {[l.op.num_vertices for l in base.levels]}", flush=True)


def descend_trunc(hs, lvl, x, bb, max_depth):
    level = hs.levels[lvl]
    if lvl == len(hs.levels) - 1:
        return coarse_solve(hs.coarse_chol, bb)
    x = _smooth(level, x, bb, cfg.pre_smooth, cfg)
    r = bb - level_matvec(level, x)
    rc = _restrict_level(level, r, True)
    if lvl + 1 > max_depth:
        ec = jnp.zeros_like(rc)
    else:
        ec = descend_trunc(hs, lvl + 1, jnp.zeros_like(rc), rc, max_depth)
    x = x + _prolong_level(level, ec, True)
    return _smooth(level, x, bb, cfg.post_smooth, cfg)


def slope(sol, make_body, tag):
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
    print(f"# {tag}: {ms:.3f} ms", flush=True)
    return ms


def attach_A(h):
    return g.attach_fast_operators(g.attach_slab_operators(h))


def attach_B(h):
    h = g.attach_slab_operators(h, min_rows=200_000)
    return g.attach_fast_operators(h)


def attach_C(h):
    h = g.attach_slab_operators(h, use_pallas=False)
    return g.attach_fast_operators(h)


for name, attach in (("A_slab_pallas", attach_A),
                     ("B_uniform_mid", attach_B),
                     ("C_slab_xla", attach_C)):
    sol = attach(load_solver(NPZ))
    d0 = slope(sol, lambda hs, bb: (
        lambda i, x: descend_trunc(hs, 0, x, bb, 0)), f"{name} depth<=0")
    d1 = slope(sol, lambda hs, bb: (
        lambda i, x: descend_trunc(hs, 0, x, bb, 1)), f"{name} depth<=1")
    full = slope(sol, lambda hs, bb: (
        lambda i, x: g.v_cycle(hs, x, bb, cfg)), f"{name} full")
    print(f"# {name}: L1_marginal={d1 - d0:.3f} ms  full={full:.3f} ms",
          flush=True)
    del sol
    import gc
    gc.collect()

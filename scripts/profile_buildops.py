"""Build-stage primitive costs: sorts, scatters, power iteration.

The warm hierarchy build at 200k measured ~460 s -- far from the <1 s
@ 1M target.  Candidate costs: RAP's 59M-element lexsort, per-level
blockdense conversion argsorts/scatters, Chebyshev lambda estimation
(30 gather-SpMVs).  This measures each primitive at bench sizes.

Usage: python scripts/profile_buildops.py
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

rng = np.random.default_rng(0)


def slope_ms(make_fn, arg, n1=2, n2=8, reps=3):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(a, iters):
        def body(_, a):
            return make_fn(a)
        return jax.lax.fori_loop(0, iters, body, a)

    def timed(iters):
        out = run(arg, iters)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]
                      .astype(jnp.float32)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(arg, iters)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]
                          .astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1) * 1000.0


def rec(name, fn, arg, **kw):
    try:
        v = slope_ms(fn, arg, **kw)
        print(f"{name:22s} {v:10.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# {name} failed: {type(e).__name__}: {str(e)[:160]}",
              flush=True)


for n in (6_400_000, 64_000_000):
    x = jnp.asarray(rng.integers(0, 1 << 30, size=n), jnp.int32)
    rec(f"sort_{n//1_000_000}M",
        lambda a: (jnp.sort(a) ^ 1), x)
    rec(f"argsort_{n//1_000_000}M",
        lambda a: jnp.argsort(a) ^ 1, x)

for n in (6_400_000, 64_000_000):
    tgt = 51_200_000
    idx = jnp.asarray(rng.integers(0, tgt, size=n), jnp.int32)
    vals = jnp.asarray(rng.normal(size=n), jnp.float32)
    buf = jnp.zeros((tgt + 1,), jnp.float32)

    def scat(a, idx=idx, vals=vals):
        return a.at[idx].add(vals) * 0.5

    rec(f"scatter_add_{n//1_000_000}M", scat, buf)

# lexsort of (rows, cols) pairs at RAP scale (59M).
n = 59_000_000
rows = jnp.asarray(rng.integers(0, 30_000, size=n), jnp.int32)
cols = jnp.asarray(rng.integers(0, 30_000, size=n), jnp.int32)


def lexsort2(a):
    r, c = a
    order = jnp.lexsort((c, r))
    return (r[order], c)


rec("lexsort_59M", lexsort2, (rows, cols))

# Chebyshev lambda estimation on the gather-ELL fine operator.
import gravomg_tpu as g
from gravomg_tpu.solve.smoothers import estimate_lambda_max
V, K = 200_000, 32
nbr = jnp.asarray(np.sort(rng.integers(0, V, size=(V, K)), 1), jnp.int32)
op = g.EllOperator(nbr, jnp.asarray(rng.normal(size=(V, K)), jnp.float32),
                   jnp.asarray(rng.normal(size=V) + 40, jnp.float32))


def lam(a):
    return estimate_lambda_max(a) + 0.0


rec("cheb_lambda_200k", lam, op, n1=1, n2=3)

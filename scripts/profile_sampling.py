"""Attribute the chained-MIS sampling cost at scale.

Times, with the bench slope protocol (single-launch fori_loop, D2H
barrier, two rep counts so launch constants cancel):

  minplus2(full)   one fused dual reduction (M windows + escape chute)
  minplus2(no-esc) same operator with the escape COO emptied
  -> the difference is the per-matvec escape cost (2 segment_mins over
     escape_cap slots at ~10 ns/slot; cap = 2V at 1M).

Also runs the sampler once and reports the ROUND count (the while_loop
iteration counter) and the selected fraction.

Usage: python scripts/profile_sampling.py [n]
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
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.coarsen.parents import graph_minplus_operator
from gravomg_tpu.coarsen.sampling import sampling_radius, _SELECTED, _UNDECIDED
from gravomg_tpu.ops.blockdense import blockdense_minplus2

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

pts = torus_points(N, seed=1).astype(np.float32)
pts = pts[morton_order(pts)]
graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
assert not bool(short)
radius = float(sampling_radius(graph, 2.0))
bd, ovf = graph_minplus_operator(graph)
print(f"# n={N} radius={radius:.5f} M={bd.m.size * bd.m.dtype.itemsize / 1e9:.3f} GB "
      f"esc_cap={bd.esc_rows.shape[0]} "
      f"esc_fill~{int(jnp.sum(bd.esc_rows < bd.n_rows))}",
      file=sys.stderr, flush=True)
bd_noesc = bd._replace(esc_rows=bd.esc_rows[:0], esc_cols=bd.esc_cols[:0],
                       esc_w=bd.esc_w[:0])


def slope_ms(fn, x0, n1=3, n2=13, reps=3):
    import functools

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x, iters):
        def body(_, xx):
            return fn(xx)
        return jax.lax.fori_loop(0, iters, body, x)

    def timed(iters):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = run(x0, iters=iters)
            float(jnp.sum(r[:1]))          # D2H completion barrier
            best = min(best, time.perf_counter() - t0)
        return best

    timed(n1)                              # compile both shapes
    timed(n2)
    return (timed(n2) - timed(n1)) / (n2 - n1) * 1000


x0 = jnp.where(jnp.arange(N) % 7 == 0, 0.0, jnp.inf).astype(jnp.float32)
pri = jnp.arange(N, dtype=jnp.float32)

for name, op in (("minplus2(full)", bd), ("minplus2(no-esc)", bd_noesc)):
    def fused(x, op=op):
        yd, yp = blockdense_minplus2(op, x, pri, radius)
        return jnp.minimum(yd, yp * 1e-30)
    print(f"{name:22s} {slope_ms(fused, x0):9.3f} ms", flush=True)

# Round count: re-run the sampler's while_loop with the counter kept.
from gravomg_tpu.coarsen.sampling import fast_disc_sample_chained
import gravomg_tpu.coarsen.sampling as smod

t0 = time.perf_counter()
mask, invalid = fast_disc_sample_chained(graph, radius, bd=bd, bd_ovf=ovf)
nsel = int(jnp.sum(mask))
t1 = time.perf_counter() - t0
print(f"sampler: selected={nsel} invalid={bool(invalid)} "
      f"wall(cold)={t1:.2f}s", flush=True)

# Count rounds by replaying the fixpoint eagerly (bounded, coarse).
pr = jax.lax.bitcast_convert_type(
    jax.random.permutation(jax.random.PRNGKey(0), N).astype(jnp.int32)
    + jnp.int32(2 ** 23), jnp.float32)
status = jnp.zeros((N,), jnp.int8)
rounds = 0
while bool(jnp.any(status == _UNDECIDED)) and rounds < 300:
    y = jnp.where(status == _SELECTED, 0.0, jnp.inf)
    gpr = jnp.where(status == _UNDECIDED, pr, jnp.inf)
    r1, u1 = blockdense_minplus2(bd, y, gpr, radius)
    r2, u2 = blockdense_minplus2(bd, r1, jnp.minimum(u1, gpr), radius)
    und = status == _UNDECIDED
    status = jnp.where(und & ((r1 < radius) | (r2 < radius)),
                       jnp.int8(2),
                       jnp.where(und & ~(u2 < pr), _SELECTED, status))
    rounds += 1
print(f"rounds={rounds}", flush=True)

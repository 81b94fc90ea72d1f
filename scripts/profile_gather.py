"""Microbenchmark TPU gather strategies for the ELL SpMV.

Same single-launch fori_loop slope protocol as bench.py.  Variants:
  flat_random   y = x[idx] with idx (V*K,) uniform random
  flat_sorted   same but idx sorted ascending
  ell_rows      x[nbr] with (V, K) row-sorted (the spmv pattern)
  ell_bf16      same gather at bf16 values
  take_along    take_along_axis formulation
  onehot_small  one-hot matmul gather within 512-blocks (windowed)
  shift_dia     129-offset DIA-style shift accumulate (no gather)
  spmv_now      current spmv() for reference

Usage: python scripts/profile_gather.py [V] [K]
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

V = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 32

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=V), jnp.float32)
idx_flat = jnp.asarray(rng.integers(0, V, size=V * K), jnp.int32)
idx_sorted = jnp.sort(idx_flat)
nbr = jnp.asarray(np.sort(rng.integers(0, V, size=(V, K)), axis=1),
                  jnp.int32)
w = jnp.asarray(rng.normal(size=(V, K)), jnp.float32)
diag = jnp.asarray(rng.normal(size=V), jnp.float32)

# Windowed local indices for the one-hot variant: block of 512 rows,
# window of 2048 x-entries starting at a per-block offset.
B, WD = 512, 2048
NB = V // B
starts = np.minimum(np.arange(NB) * B, V - WD).astype(np.int32)
lidx = rng.integers(0, WD, size=(NB, B, K)).astype(np.int32)
starts_j = jnp.asarray(starts)
lidx_j = jnp.asarray(lidx)
wb = jnp.asarray(rng.normal(size=(NB, B, K)), jnp.float32)


def slope_ms(make_fn, arg, n1=3, n2=23, reps=3):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(a, iters):
        def body(_, a):
            return make_fn(a)
        return jax.lax.fori_loop(0, iters, body, a)

    def timed(iters):
        out = run(arg, iters)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(arg, iters)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1) * 1000.0


res = {}

res["flat_random"] = slope_ms(
    lambda x: jnp.sum(x[idx_flat].reshape(V, K), axis=1) * 1e-3 + x, x0)
res["flat_sorted"] = slope_ms(
    lambda x: jnp.sum(x[idx_sorted].reshape(V, K), axis=1) * 1e-3 + x, x0)
res["ell_rows"] = slope_ms(
    lambda x: jnp.sum(w * x[nbr], axis=1) * 1e-3 + x, x0)
xb = x0.astype(jnp.bfloat16)
nb16 = nbr
res["ell_bf16"] = slope_ms(
    lambda x: (jnp.sum((w.astype(jnp.bfloat16) * x[nb16]).astype(
        jnp.float32), axis=1) * 1e-3).astype(jnp.bfloat16) + x, xb)
res["take_along"] = slope_ms(
    lambda x: jnp.sum(w * jnp.take(x, nbr, axis=0), axis=1) * 1e-3 + x, x0)


def onehot_spmv(x):
    # windows: (NB, WD) contiguous slices of x
    win = jax.vmap(lambda s: jax.lax.dynamic_slice(x, (s,), (WD,)))(starts_j)
    iota = jax.lax.broadcasted_iota(jnp.int32, (WD,), 0)

    def per_block(wn, li, wgt):
        acc = jnp.zeros((B, WD), jnp.float32)
        for k in range(K):
            acc = acc + jnp.where(iota[None, :] == li[:, k][:, None],
                                  wgt[:, k][:, None], 0.0)
        return acc @ wn

    y = jax.vmap(per_block)(win, lidx_j, wb)
    return y.reshape(-1) * 1e-3 + x[: NB * B]


res["onehot_small"] = slope_ms(onehot_spmv, x0[: NB * B])

OFFS = 129
wd_dia = jnp.asarray(rng.normal(size=(OFFS, V)), jnp.float32)


def dia_spmv(x):
    acc = diag * x
    for i, o in enumerate(range(-64, 65)):
        acc = acc + wd_dia[i] * jnp.roll(x, o)
    return acc * 1e-3 + x


res["shift_dia"] = slope_ms(dia_spmv, x0)

from gravomg_tpu.types import EllOperator
from gravomg_tpu.solve.spmv import spmv
op = EllOperator(nbr, w, diag)
res["spmv_now"] = slope_ms(lambda x: spmv(op, x) * 1e-3 + x, x0)

for k, v in res.items():
    print(f"{k:16s} {v:9.3f} ms")

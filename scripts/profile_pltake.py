"""Pallas VMEM-local gather probe (fixed block shapes).

If Mosaic lowers a dynamic VMEM gather (jnp.take / take_along_axis) at
VPU rate, the whole SpMV collapses to: DMA a window per row-block, take
K entries per row locally.  Tests several in-kernel gather spellings.

Usage: python scripts/profile_pltake.py [V]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
K = 32
B = 1024          # rows per block
WD = 8192         # window width per block

NB = V // B
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=V), jnp.float32)
starts = np.minimum((np.arange(NB) * B).astype(np.int32), V - WD)
starts = np.maximum(starts - WD // 4, 0).astype(np.int32)
lidx = rng.integers(0, WD, size=(NB, B, K)).astype(np.int32)
starts_j = jnp.asarray(starts)
lidx_j = jnp.asarray(lidx)
wloc = jnp.asarray(rng.normal(size=(NB, B, K)), jnp.float32)


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


def make_variant(gather_body):
    def kernel(starts_ref, x_hbm, li_ref, w_ref, o_ref, win, sem):
        b = pl.program_id(0)
        s = starts_ref[b]
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(s, WD)], win, sem)
        dma.start()
        dma.wait()
        out = gather_body(win, li_ref, w_ref)
        o_ref[0, :, :] = out.reshape(8, B // 8 * K // K, -1)[:, :, 0] \
            if False else out.reshape(8, -1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, B, K), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, K), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, B // 8), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((WD,), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )

    def fn(x):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NB, 8, B // 8), jnp.float32),
            grid_spec=grid_spec,
        )(starts_j, x, lidx_j, wloc)
        return out.reshape(-1) * 1e-3 + x[: NB * B]

    return fn


def body_take(win, li_ref, w_ref):
    acc = jnp.zeros((B,), jnp.float32)
    xl = win[:]
    for k in range(K):
        acc = acc + w_ref[0, :, k] * jnp.take(xl, li_ref[0, :, k], axis=0)
    return acc


def body_getitem(win, li_ref, w_ref):
    acc = jnp.zeros((B,), jnp.float32)
    xl = win[:]
    for k in range(K):
        acc = acc + w_ref[0, :, k] * xl[li_ref[0, :, k]]
    return acc


def body_take_along(win, li_ref, w_ref):
    xl = win[:]
    li = li_ref[0]                    # (B, K)
    vals = jnp.take(xl, li.reshape(-1), axis=0).reshape(B, K)
    return jnp.sum(w_ref[0] * vals, axis=1)


for name, body in (("pl_take", body_take), ("pl_getitem", body_getitem),
                   ("pl_take_flat", body_take_along)):
    try:
        t = slope_ms(make_variant(body), x0[: NB * B])
        print(f"{name:14s} {t:9.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# {name} failed: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

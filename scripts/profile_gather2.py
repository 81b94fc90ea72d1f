"""Second-round gather probes: XLA gather cost model + Pallas options.

Slope protocol (single-launch fori_loop), 200k x 32 reference = 46 ms:
  pl_take    Pallas kernel: jnp.take inside a VMEM window (decisive)
  g_w8       lax.gather V*K/8 indices, 8-wide slices (cost ~ #indices?)
  g_w128     row gather from (V,128): V indices      (width amortized?)
  g_rhs8     (V,8) x gathered at (V,K) indices       (8 RHS same cost?)
  dia_2049   2049-offset DIA via grouped loop        (wide-band cost)
  tail_coo   0.25M-element sorted-COO gather+segsum  (tail handling)
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


def rec(name, fn, arg, **kw):
    try:
        v = slope_ms(fn, arg, **kw)
    except Exception as e:  # noqa: BLE001
        v = float("nan")
        print(f"# {name} failed: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
    print(f"{name:10s} {v:9.3f} ms", flush=True)


# ---- pl_take (decisive) ----
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, WD = 1024, 8192
    NB = V // B
    starts = np.minimum((np.arange(NB) * B).astype(np.int32), V - WD)
    lidx = rng.integers(0, WD, size=(NB, B, K)).astype(np.int32)
    starts_j = jnp.asarray(starts)
    lidx_j = jnp.asarray(lidx)
    wloc = jnp.asarray(rng.normal(size=(NB, B, K)), jnp.float32)

    def kernel(starts_ref, x_hbm, li_ref, w_ref, o_ref, win, sem):
        b = pl.program_id(0)
        s = starts_ref[b]
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(s, WD)], win, sem)
        dma.start()
        dma.wait()
        xl = win[:]
        out = jnp.zeros((B,), jnp.float32)
        for k in range(K):
            out = out + w_ref[0, :, k] * jnp.take(xl, li_ref[0, :, k],
                                                  axis=0)
        o_ref[0, :] = out

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # x stays in HBM
            pl.BlockSpec((1, B, K), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, K), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B), lambda b, *_: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((WD,), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )

    def pl_take(x):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NB, B), jnp.float32),
            grid_spec=grid_spec,
        )(starts_j, x, lidx_j, wloc)
        return out.reshape(-1) * 1e-3 + x[: NB * B]

    rec("pl_take", pl_take, x0[: NB * B])
except Exception as e:  # noqa: BLE001
    print(f"# pallas setup failed: {type(e).__name__}: {str(e)[:300]}",
          flush=True)

# ---- XLA gather shape variants ----
idx8 = jnp.asarray(rng.integers(0, V - 8, size=V * K // 8), jnp.int32)
dn = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))


def g_w8(x):
    out = jax.lax.gather(x, idx8[:, None], dn, slice_sizes=(8,),
                         mode=jax.lax.GatherScatterMode.CLIP)
    return jnp.sum(out.reshape(V, K), axis=1) * 1e-5 + x


rec("g_w8", g_w8, x0)

idxv = jnp.asarray(rng.integers(0, V, size=V), jnp.int32)
x2d = jnp.asarray(rng.normal(size=(V, 128)), jnp.float32)
rec("g_w128", lambda x: x[idxv].at[:, 0].add(1e-6), x2d)

nbr = jnp.asarray(np.sort(rng.integers(0, V, size=(V, K)), axis=1),
                  jnp.int32)
x8 = jnp.asarray(rng.normal(size=(V, 8)), jnp.float32)
rec("g_rhs8", lambda x: jnp.sum(x[nbr], axis=1) * 1e-3 + x, x8)

# ---- wide DIA via grouped loop (compact HLO) ----
W2, G = 1024, 128
NOFF = 2 * W2 + 1
NG = (NOFF + G - 1) // G
bands = jnp.asarray(rng.normal(size=(NG * G, V)).astype(np.float32))


def dia_wide(x):
    xp = jnp.pad(x, (W2, W2 + G))

    def group(g, acc):
        def inner(t, acc):
            j = g * G + t
            return acc + jax.lax.dynamic_slice(bands, (j, 0), (1, V))[0] \
                * jax.lax.dynamic_slice(xp, (j,), (V,))
        return jax.lax.fori_loop(0, G, inner, acc)

    acc = jax.lax.fori_loop(0, NG, group, jnp.zeros_like(x))
    return acc * 1e-3 + x


rec("dia_2049", dia_wide, x0, n1=2, n2=8)

# ---- sorted-COO tail: gather + sorted segment-sum ----
E = V * K // 25   # ~4% tail
tr = jnp.sort(jnp.asarray(rng.integers(0, V, size=E), jnp.int32))
tc = jnp.asarray(rng.integers(0, V, size=E), jnp.int32)
tw = jnp.asarray(rng.normal(size=E), jnp.float32)


def tail_coo(x):
    contrib = tw * x[tc]
    y = jax.ops.segment_sum(contrib, tr, num_segments=V,
                            indices_are_sorted=True)
    return y * 1e-3 + x


rec("tail_coo", tail_coo, x0)

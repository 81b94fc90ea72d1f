"""Component-level banded SpMV probe + candidate fast variants.

Times each part of banded_spmv separately at bench scale, plus:
  band_static   static-unrolled roll sweep (dia129-style)
  band_dyn      grouped fori_loop dynamic-slice sweep (current impl)
  far_onehot    current one-hot resolve (suspected materialization)
  far_matmul    two-stage: segment-mask MXU matmul + 8-wide one-hot
  esc_segsum    sorted segment_sum escape (current impl)
  esc_bucket    block-bucketed one-hot escape

Usage: python scripts/profile_banded2.py [V]
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
W = 128
NOFF = 2 * W + 1
BLK, WIN, NW, KF = 16, 256, 2, 32
NBLK = -(-V // BLK)
SUB = 8
NSEG = WIN // SUB

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=V), jnp.float32)
bands = jnp.asarray(rng.normal(size=(NOFF, V)), jnp.float32)
win_start = jnp.asarray(
    np.sort(rng.integers(0, V - WIN, size=(NBLK, NW)), axis=1), jnp.int32)
far_sel = jnp.asarray(rng.integers(0, NW, size=(V, KF)), jnp.int8)
far_lidx = jnp.asarray(rng.integers(0, WIN, size=(V, KF)), jnp.int32)
far_w = jnp.asarray(rng.normal(size=(V, KF)), jnp.float32)
E = 32768
esc_rows = jnp.sort(jnp.asarray(rng.integers(0, V, size=E), jnp.int32))
esc_cols = jnp.asarray(rng.integers(0, V, size=E), jnp.int32)
esc_w = jnp.asarray(rng.normal(size=E), jnp.float32)


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
        print(f"{name:14s} {v:9.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# {name} failed: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


# --- band sweep variants ---
def band_static(x):
    xp = jnp.pad(x, (W, W))
    acc = x * 0.5
    for j in range(NOFF):
        acc = acc + bands[j] * jax.lax.dynamic_slice(xp, (j,), (V,))
    return acc * 1e-3 + x


rec("band_static", band_static, x0)


def band_dyn(x):
    g = 64
    ng = -(-NOFF // g)
    xp = jnp.pad(x, (W, W + ng * g - NOFF))
    bp = jnp.pad(bands, ((0, ng * g - NOFF), (0, 0)))
    acc0 = x * 0.5

    def group(gi, acc):
        def step(t, acc):
            j = gi * g + t
            band = jax.lax.dynamic_slice(bp, (j, 0), (1, V))[0]
            return acc + band * jax.lax.dynamic_slice(xp, (j,), (V,))
        return jax.lax.fori_loop(0, g, step, acc, unroll=g)

    return jax.lax.fori_loop(0, ng, group, acc0) * 1e-3 + x


rec("band_dyn", band_dyn, x0)


def _windows(x):
    xw = jnp.pad(x, (0, WIN))
    idx = win_start.reshape(-1)
    wins = jax.vmap(lambda s: jax.lax.dynamic_slice(xw, (s,), (WIN,)))(idx)
    return wins.reshape(NBLK, NW, WIN)


# --- far variants ---
def far_onehot(x):
    wins = _windows(x).reshape(NBLK, 1, NW, WIN)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, WIN), 3)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, 1, NW, 1), 2)
    fsel = far_sel.reshape(NBLK, BLK, KF)
    flid = far_lidx.reshape(NBLK, BLK, KF)
    fw = far_w.reshape(NBLK, BLK, KF)
    acc = jnp.zeros((NBLK, BLK), jnp.float32)
    for ks in range(KF):
        sel = fsel[:, :, ks].astype(jnp.int32)
        li = flid[:, :, ks]
        oh = ((iota_w == li[:, :, None, None])
              & (iota_n == sel[:, :, None, None]))
        acc = acc + fw[:, :, ks] * jnp.sum(jnp.where(oh, wins, 0.0),
                                           axis=(2, 3))
    return acc.reshape(-1)[:V] * 1e-3 + x


rec("far_onehot", far_onehot, x0)


def far_matmul(x):
    wins = _windows(x).reshape(NBLK, NW * NSEG, SUB)
    fsel = far_sel.reshape(NBLK, BLK, KF).astype(jnp.int32)
    flid = far_lidx.reshape(NBLK, BLK, KF)
    fw = far_w.reshape(NBLK, BLK, KF)
    seg = fsel * NSEG + (flid // SUB)          # (NBLK, BLK, KF)
    lo = flid % SUB
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, NW * NSEG), 2)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, SUB), 3)
    acc = jnp.zeros((NBLK, BLK), jnp.float32)
    # mask (NBLK, BLK, NW*NSEG) bf16 per slot; contraction on the MXU.
    for ks in range(KF):
        m = (iota_s == seg[:, :, ks][:, :, None]).astype(jnp.bfloat16)
        sub = jax.lax.dot_general(
            m, wins.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # (NBLK, BLK, SUB)
        oh = (iota_l[0] == lo[:, :, ks][:, :, None])
        acc = acc + fw[:, :, ks] * jnp.sum(jnp.where(oh, sub, 0.0), axis=2)
    return acc.reshape(-1)[:V] * 1e-3 + x


rec("far_matmul", far_matmul, x0)


# --- escape variants ---
def esc_segsum(x):
    contrib = esc_w * x[esc_cols]
    y = jax.ops.segment_sum(contrib, esc_rows, num_segments=V,
                            indices_are_sorted=True)
    return y * 1e-3 + x


rec("esc_segsum", esc_segsum, x0)

EB = E // NBLK * 4  # per-block escape capacity
esc_blk = np.asarray(esc_rows) // BLK
# bucket escape entries per block (host-side prep for probe)
perm = np.argsort(esc_blk, kind="stable")
eb_rows = np.full((NBLK, EB), 0, np.int32)
eb_cols = np.zeros((NBLK, EB), np.int32)
eb_w = np.zeros((NBLK, EB), np.float32)
fill = np.zeros(NBLK, np.int32)
er = np.asarray(esc_rows)[perm]
ec = np.asarray(esc_cols)[perm]
ew = np.asarray(esc_w)[perm]
for r, c, wv in zip(er, ec, ew):
    b = r // BLK
    if fill[b] < EB:
        eb_rows[b, fill[b]] = r % BLK
        eb_cols[b, fill[b]] = c
        eb_w[b, fill[b]] = wv
        fill[b] += 1
eb_rows_j = jnp.asarray(eb_rows)
eb_cols_j = jnp.asarray(eb_cols)
eb_w_j = jnp.asarray(eb_w)


def esc_bucket(x):
    vals = eb_w_j * x[eb_cols_j]               # (NBLK, EB) gather
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, BLK, 1), 1)
    oh = iota_b == eb_rows_j[:, None, :]       # (NBLK, BLK, EB)
    y = jnp.sum(jnp.where(oh, vals[:, None, :], 0.0), axis=2)
    return y.reshape(-1)[:V] * 1e-3 + x


rec("esc_bucket", esc_bucket, x0)


# --- block-dense variants (precomputed dense window matrices) ---
from gravomg_tpu.ops.blockdense import (blockdense_from_operator,
                                        blockdense_matvec)
from gravomg_tpu.types import EllOperator

nbr_bd = jnp.asarray(
    np.sort(rng.integers(0, V, size=(V, KF)), axis=1), jnp.int32)
op_bd = EllOperator(nbr_bd, far_w, jnp.asarray(rng.normal(size=V),
                                               jnp.float32))

# purely random columns: coverage terrible; instead synthesize a banded+
# fold structure like the real graph: 80% near-diagonal, 20% clustered.
near = np.clip(np.arange(V)[:, None]
               + rng.integers(-100, 100, size=(V, KF)), 0, V - 1)
fold = np.clip((np.arange(V)[:, None] // 4096) * 4096 + 60000
               + rng.integers(0, 200, size=(V, KF)), 0, V - 1) % V
mixm = rng.random((V, KF)) < 0.2
synth = np.where(mixm, fold, near).astype(np.int32)
synth.sort(axis=1)
op_syn = EllOperator(jnp.asarray(synth), far_w,
                     jnp.asarray(rng.normal(size=V), jnp.float32))

for name, blk, win, nw, dt in (
        ("bd_64_256_4_f32", 64, 256, 4, jnp.float32),
        ("bd_64_256_4_bf16", 64, 256, 4, jnp.bfloat16),
        ("bd_128_512_2_f32", 128, 512, 2, jnp.float32),
        ("bd_64_128_6_f32", 64, 128, 6, jnp.float32)):
    try:
        bop, ovf = blockdense_from_operator(
            op_syn, block=blk, window=win, nw=nw, escape_cap=V)
        n_esc = int(jnp.sum(bop.esc_w != 0))
        if dt != jnp.float32:
            bop = bop._replace(m=bop.m.astype(dt))
        # pass the operator as a jit ARG: closure capture would bake
        # the 800MB dense M into the compile request (HTTP 413)
        t = slope_ms(lambda a: (blockdense_matvec(a[1], a[0]) * 1e-3
                                + a[0], a[1]),
                     (x0, bop))
        print(f"{name:18s} {t:9.3f} ms (esc={n_esc})", flush=True)
    except Exception as e:
        print(f"# {name} failed: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


# --- multiply-reduce formulation (VPU streaming, no batched GEMV) ---
def bd_multred(a):
    x, bop = a
    nblk, nw = bop.win_start.shape
    win = bop.window
    xw = jnp.pad(x, (0, win))
    idx = bop.win_start.reshape(-1)
    wins = jax.vmap(lambda s: jax.lax.dynamic_slice(xw, (s,), (win,)))(idx)
    wins = wins.reshape(nblk, 1, nw * win).astype(bop.m.dtype)
    y = jnp.sum(bop.m * wins, axis=2, dtype=jnp.float32)
    y = y.reshape(-1)[:V].astype(x.dtype)
    return y * 1e-3 + x + bop.diag * 0, bop

for name, blk, win, nw, dt in (
        ("bdmr_64_256_4_f32", 64, 256, 4, jnp.float32),
        ("bdmr_64_256_4_bf16", 64, 256, 4, jnp.bfloat16),
        ("bdmr_256_512_2_f32", 256, 512, 2, jnp.float32),
        ("bdmr_8_256_4_f32", 8, 256, 4, jnp.float32)):
    try:
        bop, ovf = blockdense_from_operator(
            op_syn, block=blk, window=win, nw=nw, escape_cap=V)
        n_esc = int(jnp.sum(bop.esc_w != 0))
        if dt != jnp.float32:
            bop = bop._replace(m=bop.m.astype(dt))
        t = slope_ms(bd_multred, (x0, bop))
        print(f"{name:20s} {t:9.3f} ms (esc={n_esc})", flush=True)
    except Exception as e:
        print(f"# {name} failed: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

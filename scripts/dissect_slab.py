"""Dissect the slab SpMV at level-0 scale: which stage eats the time?

Times, on the same 200k operator:
  * the full slab matvec (XLA and Pallas bucket kernels),
  * escape chutes ablated (zero-length COO),
  * block un-permutation ablated,
  * the window row-gather alone,
  * the gathered multiply-reduce alone (windows resident),
plus a raw HBM roofline probe, so each stage is judged against a
measured bandwidth, not a datasheet one.

Usage: python scripts/dissect_slab.py [n] [blk ...]
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
from gravomg_tpu.ops.slab import slab_from_operator, slab_matvec

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
BLKS = [int(a) for a in sys.argv[2:]] or [8, 32, 64]

pts = torus_points(N, seed=1).astype(np.float32)
pts = pts[morton_order(pts)]
graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
lap, mass = g.graph_laplacian(graph, "invdist")
spd = lap._replace(diag=lap.diag + 0.5 * mass)
x = jnp.asarray(np.random.default_rng(0).normal(size=N), jnp.float32)


def slope_ms(fn, args0, n1=3, n2=23, reps=3):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(args, iters):
        xx, aux = args

        def body(_, v):
            return fn(aux, v) * 0.5

        return jax.lax.fori_loop(0, iters, body, xx), aux

    def timed(iters):
        out = run(args0, iters)
        float(jnp.sum(out[0][:4]))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(args0, iters)
            float(jnp.sum(out[0][:4]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(n1)
    t2 = timed(n2)
    return (t2 - t1) / (n2 - n1) * 1000.0


# --- roofline probe ---------------------------------------------------------
big = jnp.asarray(np.random.default_rng(9).normal(size=(256 * 1024, 1024)),
                  jnp.float32)                                 # 1 GB
mb = big.size * 4 / 1e6
zero8 = jnp.zeros((8,), jnp.float32)
# Dense GEMV: the SpMV access pattern at 100% density; the carry feeds
# the vector so nothing hoists out of the timing loop.
x1k = jnp.asarray(np.random.default_rng(3).normal(size=1024), jnp.float32)
t = slope_ms(lambda a, v: v * 0.5 + (a @ v)[:1024] * 1e-30, (x1k, big))
print(f"roofline f32 GEMV(1GB): {t:.3f}ms -> {mb/t:.0f} GB/s", flush=True)
big16 = big.astype(jnp.bfloat16)
t = slope_ms(lambda a, v: v * 0.5
             + (a @ v.astype(jnp.bfloat16)).astype(jnp.float32)[:1024]
             * 1e-30, (x1k, big16))
print(f"roofline bf16 GEMV(512MB): {t:.3f}ms -> {mb/2/t:.0f} GB/s",
      flush=True)


def strip_escape(op):
    return op._replace(buckets=tuple(
        b._replace(esc_rows=b.esc_rows[:0], esc_cols=b.esc_cols[:0],
                   esc_w=b.esc_w[:0]) for b in op.buckets))


for blk in BLKS:
    sop = slab_from_operator(spd, block=blk, window=128, escape_cap=65536)
    mb = sop.m_bytes / 1e6
    progs = sum(b.m.shape[0] for b in sop.buckets)
    esc = sum(int(b.esc_w.shape[0]) for b in sop.buckets)
    print(f"slab blk={blk}: M={mb:.0f}MB blocks={progs} esc_slots={esc} "
          f"buckets={[(b.m.shape[0], b.nw) for b in sop.buckets]}",
          flush=True)

    for name, pallas in (("xla", False), ("pallas", True)):
        t_full = slope_ms(lambda o, v: slab_matvec(o, v, pallas=pallas),
                          (x, sop))
        t_noesc = slope_ms(lambda o, v: slab_matvec(o, v, pallas=pallas),
                           (x, strip_escape(sop)))
        print(f"  {name}: full={t_full:.3f}ms no_escape={t_noesc:.3f}ms "
              f"(bw_full={mb/t_full:.0f} GB/s)", flush=True)

    # Stage probes on the largest bucket only (XLA forms).
    b0 = max(sop.buckets, key=lambda b: b.m.size)
    nb, bb, nww = b0.m.shape
    segs = jnp.concatenate(
        [b0.win_start[:, wi:wi + 1] // 128
         + jnp.arange((b0.window0 if wi == 0 else b0.window) // 128,
                      dtype=b0.win_start.dtype)[None, :] * 0
         for wi in range(b0.nw)], axis=1)  # crude: 128-wide windows only
    pad = -(-(x.shape[0] + 128) // 128) * 128 - x.shape[0]
    x2 = jnp.pad(x, (0, pad)).reshape(-1, 128)
    t_g = slope_ms(
        lambda s, v: v * 0.5
        + jnp.sum((x2 + v[0])[s.reshape(-1)]) * 1e-30, (zero8, segs))
    rows = segs.size
    print(f"  bucket0 ({nb}x{bb}x{nww}): gather {rows} rows "
          f"= {t_g:.3f}ms ({t_g*1e6/rows:.1f} ns/row)", flush=True)
    wins = x2[segs.reshape(-1)].reshape(nb, 1, -1)
    mbb = b0.m.size * 4 / 1e6
    t_m = slope_ms(lambda mm, v: v * 0.5 + jnp.sum(
        jnp.sum(mm * (wins + v[0]), axis=2)) * 1e-30, (zero8, b0.m))
    print(f"  bucket0 resident mul-reduce: {t_m:.3f}ms "
          f"({mbb/t_m:.0f} GB/s of {mbb:.0f}MB)", flush=True)

"""TPU microbenchmark: Pallas vs XLA block-dense SpMV at level-0 scale.

Builds only the level-0 operator, converts at several window
geometries, and slope-times (bench.py protocol) the XLA
blockdense_matvec against the Pallas kernel -- establishing achieved
bandwidth and per-program overhead before committing to a slab design.

Usage: python scripts/profile_pallas.py [n]
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
from gravomg_tpu.ops.blockdense import (blockdense_from_operator,
                                        blockdense_matvec)
from gravomg_tpu.ops.pallas_blockdense import blockdense_matvec_pallas

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

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


GEOMS = [
    # (block, window, nw, window0)  -- round-2 default first
    (256, 128, 6, 768),
    (64, 128, 10, 384),
]

for blk, win, nw, w0 in GEOMS:
    bop, ovf = blockdense_from_operator(
        spd, block=blk, window=win, nw=nw, escape_cap=200_000,
        window0=w0, align=128)
    nblk, _, nww = bop.m.shape
    mb = bop.m.size * 4 / 1e6
    n_esc = int(jnp.sum(bop.esc_rows < bop.n_rows))
    print(f"geom blk={blk} w0={w0} wf={win} nw={nw}: "
          f"M={mb:.0f}MB programs={nblk} esc={n_esc} ovf={bool(ovf)}",
          flush=True)
    y_x = blockdense_matvec(bop, x)
    y_p = blockdense_matvec_pallas(bop, x)
    err = float(jnp.max(jnp.abs(y_x - y_p))
                / jnp.maximum(jnp.max(jnp.abs(y_x)), 1e-30))
    t_x = slope_ms(blockdense_matvec, (x, bop))
    t_p = slope_ms(blockdense_matvec_pallas, (x, bop))
    ideal = mb / 819e3
    print(f"  xla={t_x:.3f}ms pallas={t_p:.3f}ms ideal={ideal:.3f}ms "
          f"rel_err={err:.2e}", flush=True)


# Bucketed variable-window form (ops/slab.py): XLA vs Pallas per bucket.
from gravomg_tpu.ops.slab import slab_from_operator, slab_matvec

for blk in (8, 16, 32):
    sop = slab_from_operator(spd, block=blk, window=128,
                             escape_cap=65536)
    mb = sop.m_bytes / 1e6
    progs = sum(b.m.shape[0] for b in sop.buckets)
    print(f"slab blk={blk}: M={mb:.0f}MB programs={progs} buckets="
          f"{[(b.m.shape[0], b.nw) for b in sop.buckets]}", flush=True)
    y_x = slab_matvec(sop, x, pallas=False)
    y_p = slab_matvec(sop, x, pallas=True)
    y_u = blockdense_matvec(bop, x)
    err = float(jnp.max(jnp.abs(y_x - y_u))
                / jnp.maximum(jnp.max(jnp.abs(y_u)), 1e-30))
    errp = float(jnp.max(jnp.abs(y_p - y_u))
                 / jnp.maximum(jnp.max(jnp.abs(y_u)), 1e-30))
    t_x = slope_ms(lambda o, v: slab_matvec(o, v, pallas=False), (x, sop))
    t_p = slope_ms(lambda o, v: slab_matvec(o, v, pallas=True), (x, sop))
    ideal = mb / 819e3
    print(f"  xla={t_x:.3f}ms pallas={t_p:.3f}ms ideal={ideal:.3f}ms "
          f"err_xla={err:.2e} err_pallas={errp:.2e}", flush=True)


# Transposed-tile MXU form: one (1,128)@(128,128) MXU op per segment.
sop = slab_from_operator(spd, mxu=True, escape_cap=65536)
mb = sop.m_bytes / 1e6
nblocks = sum(b.m.shape[0] for b in sop.buckets)
print(f"mxu: M={mb:.0f}MB blocks={nblocks} buckets="
      f"{[(b.m.shape[0], b.m.shape[1]) for b in sop.buckets]}", flush=True)
y_m = slab_matvec(sop, x, pallas=False)
y_mp = slab_matvec(sop, x, pallas=True)
y_u = blockdense_matvec(bop, x)
errx = float(jnp.max(jnp.abs(y_m - y_u))
             / jnp.maximum(jnp.max(jnp.abs(y_u)), 1e-30))
errp = float(jnp.max(jnp.abs(y_mp - y_u))
             / jnp.maximum(jnp.max(jnp.abs(y_u)), 1e-30))
t_x = slope_ms(lambda o, v: slab_matvec(o, v, pallas=False), (x, sop))
t_p = slope_ms(lambda o, v: slab_matvec(o, v, pallas=True), (x, sop))
print(f"  xla={t_x:.3f}ms pallas={t_p:.3f}ms ideal={mb/819e3*1e3:.3f}ms "
      f"err_xla={errx:.2e} err_pallas={errp:.2e}", flush=True)

# bf16 tiles (preconditioner dtype): halves the stream.
sop16 = sop._replace(buckets=tuple(
    b._replace(m=b.m.astype(jnp.bfloat16)) for b in sop.buckets))
t_p16 = slope_ms(lambda o, v: slab_matvec(o, v, pallas=True), (x, sop16))
print(f"  bf16 pallas={t_p16:.3f}ms", flush=True)

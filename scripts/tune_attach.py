"""Tune block-dense attach parameters on a saved hierarchy.

Loads the compacted 200k solver (scripts/../tmp flow: /tmp/sol200k.npz
written by a one-time build) and, for a grid of window geometries,
prints the escape count, converged shape, and matvec slope time for
the fine operator, U, and U^T.

Usage: python scripts/tune_attach.py [path]
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
from gravomg_tpu.io.serialization import load_solver
from gravomg_tpu.ops.blockdense import (blockdense_from_ell,
                                        blockdense_from_operator,
                                        blockdense_matvec)

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sol200k.npz"
sol = load_solver(path)
lvl = sol.levels[0]
op = lvl.op
v = op.num_vertices
print(f"# fine op ({v}, {op.max_degree})", flush=True)


def slope_ms(make_fn, arg, n1=3, n2=13, reps=3):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(a, iters):
        x, aux = a
        def body(_, xx):
            return make_fn(xx, aux)
        return jax.lax.fori_loop(0, iters, body, x), aux

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


x0 = jnp.asarray(np.random.default_rng(0).normal(size=v), jnp.float32)

for (blk, w0, wf, nw, cap) in (
        (256, 768, 128, 6, v),
        (256, 768, 128, 10, v),
        (256, 1024, 128, 8, v),
        (512, 1536, 128, 8, v),
        (256, 768, 256, 6, v),
        (1024, 2560, 256, 6, v)):
    try:
        bd, ovf = blockdense_from_operator(
            op, block=blk, window=wf, window0=w0, nw=nw, escape_cap=cap)
        esc = int(jnp.sum(bd.esc_w != 0))
        t = slope_ms(lambda x, b: blockdense_matvec(b, x) * 1e-3 + x,
                     (x0, bd))
        nww = bd.m.shape[2]
        print(f"A blk={blk} w0={w0} wf={wf} nw={nw}: esc={esc} "
              f"nww={nww} t={t:.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# A blk={blk} w0={w0} nw={nw} failed: "
              f"{type(e).__name__}: {str(e)[:150]}", flush=True)

rt = lvl.ut
print(f"# ut ({rt.n_coarse}, {rt.max_children}) n_fine={rt.n_fine}",
      flush=True)
xf = jnp.asarray(np.random.default_rng(1).normal(size=rt.n_fine),
                 jnp.float32)
for (blk, w0, wf, nw) in ((64, 1024, 128, 4), (64, 1536, 128, 4),
                          (128, 2048, 128, 6), (32, 768, 128, 4)):
    try:
        bd, ovf = blockdense_from_ell(
            rt.safe_rows(), rt.weights, rt.rows != g.INVALID_INDEX,
            rt.n_fine, block=blk, window=wf, window0=w0, nw=nw,
            escape_cap=rt.n_coarse * 96)
        esc = int(jnp.sum(bd.esc_w != 0))
        t = slope_ms(lambda x, b: x * 0.5 + jnp.pad(
            blockdense_matvec(b, x),
            (0, x.shape[0] - b.n_rows)) * 1e-9, (xf, bd))
        print(f"UT blk={blk} w0={w0} wf={wf} nw={nw}: esc={esc} "
              f"nww={bd.m.shape[2]} t={t:.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# UT blk={blk} failed: {type(e).__name__}: "
              f"{str(e)[:150]}", flush=True)

u = lvl.u
print(f"# u n_fine={u.n_fine} n_coarse={u.n_coarse}", flush=True)
xc = jnp.asarray(np.random.default_rng(2).normal(size=u.n_coarse),
                 jnp.float32)
for (blk, w0, wf, nw) in ((256, 128, 64, 3), (256, 256, 128, 3),
                          (1024, 512, 128, 4)):
    try:
        bd, ovf = blockdense_from_ell(
            u.cols, u.weights, jnp.ones_like(u.cols, bool), u.n_coarse,
            block=blk, window=wf, window0=w0, nw=nw, escape_cap=v)
        esc = int(jnp.sum(bd.esc_w != 0))
        t = slope_ms(lambda x, b: x * 0.5
                     + blockdense_matvec(b, x)[:u.n_coarse] * 1e-9,
                     (xc, bd))
        print(f"U blk={blk} w0={w0} wf={wf} nw={nw}: esc={esc} "
              f"nww={bd.m.shape[2]} t={t:.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# U blk={blk} failed: {type(e).__name__}: "
              f"{str(e)[:150]}", flush=True)

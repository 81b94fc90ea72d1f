"""Attribute the 1M chained-sampling cost: per-round time vs round count.

`fast_disc_sample_chained` at 1M measures ~5.0 s with the operator
prebuilt (profile_build1m_v2).  Each round is two fused dual min-plus
streams of the bf16 conflict operator (~1.3 GB), so bandwidth says
~5-15 ms/round; 5 s means either ~100x per-round overhead or hundreds
of rounds.  This probe times (a) K fixed rounds via a fori_loop slope
(launch cost cancels) and (b) the shipped while_loop, and reports the
actual converged round count.

Usage: python scripts/probe_sampling1m.py [n=1000000]
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
import functools

from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.coarsen.sampling import (fast_disc_sample_chained,
                                          sampling_radius,
                                          _SELECTED, _UNDECIDED, _REJECTED)
from gravomg_tpu.coarsen.parents import graph_minplus_operator
from gravomg_tpu.ops.blockdense import blockdense_minplus2
import gravomg_tpu as g

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def main():
    pts = torus_points(N, seed=1).astype(np.float32)
    pts = pts[morton_order(pts)]
    graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
    assert not bool(short)
    radius = float(sampling_radius(graph, g.MultigridConfig().reduction_ratio))
    bd, bd_ovf = graph_minplus_operator(graph)
    jax.block_until_ready(bd.m)
    print(f"n={N} op m={bd.m.shape} {bd.m.dtype} "
          f"esc={bd.esc_w.shape}", flush=True)

    v = graph.num_vertices
    perm = jax.random.permutation(jax.random.PRNGKey(0), v)
    pr = jax.lax.bitcast_convert_type(
        perm.astype(jnp.int32) + jnp.int32(2 ** 23), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def k_rounds_impl(bd_arg, pr_arg, rad_arg, k):
        # bd passed as ARGUMENT: closure capture embeds the 2.6 GB
        # operator as lowering constants and 413s the remote compile
        # service (PROGRESS.md pathology 3).
        def round_body(status, _):
            y = jnp.where(status == _SELECTED, 0.0, jnp.inf)
            gpr = jnp.where(status == _UNDECIDED, pr_arg, jnp.inf)
            r1, u1 = blockdense_minplus2(bd_arg, y, gpr, rad_arg)
            r2, u2 = blockdense_minplus2(bd_arg, r1,
                                         jnp.minimum(u1, gpr), rad_arg)
            sel_conflict = (r1 < rad_arg) | (r2 < rad_arg)
            und = status == _UNDECIDED
            new = jnp.where(und & sel_conflict, _REJECTED,
                            jnp.where(und & ~(u2 < pr_arg), _SELECTED,
                                      status)).astype(jnp.int8)
            return new, jnp.sum(und.astype(jnp.int32))

        return jax.lax.scan(round_body, jnp.zeros((v,), jnp.int8),
                            None, length=k)

    rad_arr = jnp.float32(radius)

    def k_rounds(k):
        return k_rounds_impl(bd, pr, rad_arr, k)

    def probe(x):
        return float(jnp.sum(jnp.ravel(
            jax.tree_util.tree_leaves(x)[0])[:4].astype(jnp.float32)))

    # Slope: T(k2) - T(k1) isolates per-round cost.
    for k in (2, 10):
        st, und = k_rounds(k)
        probe(st)
    times = {}
    for k in (2, 10):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            probe(k_rounds(k))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
        print(f"T({k} rounds) = {best*1000:.1f} ms", flush=True)
    print(f"per-round slope = {(times[10]-times[2])/8*1000:.2f} ms",
          flush=True)

    # Round count to convergence: 24 recorded rounds (a 256-round scan
    # is one ~70 s launch -- the device watchdog kills it), find the
    # first round with zero undecided.
    st, und = k_rounds(24)
    und_np = np.asarray(und)
    conv = int(np.argmax(und_np == 0)) if (und_np == 0).any() else -1
    print(f"undecided per round (first 40): {und_np[:40].tolist()}",
          flush=True)
    print(f"rounds to convergence: {conv}", flush=True)

    # The shipped while_loop for comparison.
    def shipped():
        return fast_disc_sample_chained(graph, radius, bd=bd,
                                        bd_ovf=bd_ovf)
    probe(shipped())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        probe(shipped())
        best = min(best, time.perf_counter() - t0)
    print(f"shipped while_loop: {best*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

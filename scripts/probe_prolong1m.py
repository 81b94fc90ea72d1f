"""Attribute the affine prolongation kernel's 1M cost (4.76 s post-rework).

Times the full kernel against ablated variants (hit-scan only; no
kill-rule (B, Kc, A) reductions; candidate width A sliced to 32) on
level-0 inputs built by the default pipeline.  Decides whether the
next cut is a two-pass A-width escalation or kill-rule restructuring.

Usage: python scripts/probe_prolong1m.py [n=1000000]
"""

import os
import sys
import time
import functools

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
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.hierarchy_static import plan_levels
from gravomg_tpu.coarsen.sampling import (fast_disc_sample_chained,
                                          sampling_radius)
from gravomg_tpu.coarsen.parents import (assign_parents_bd,
                                         graph_minplus_operator)
from gravomg_tpu.coarsen.graph import coarse_graph, extract_coarse_edges_local
from gravomg_tpu.coarsen.placement import coarse_from_mean_of_fine_children
from gravomg_tpu.prolong.triangles import construct_voronoi_triangles
from gravomg_tpu.prolong import operator as P
from gravomg_tpu.types import INVALID_INDEX

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def probe(x):
    return float(jnp.sum(jnp.ravel(
        jax.tree_util.tree_leaves(x)[0])[:4].astype(jnp.float32)))


def timed(name, fn, reps=3):
    out = fn()
    probe(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        probe(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1000:10.2f} ms", flush=True)
    return out


@functools.partial(jax.jit, static_argnames=("mode", "block"))
def ablated(fine_points, parents, coarse_points, coarse_nbr, triangles,
            mode: str, block: int = 16384):
    packed_rot, enc, nbr_planes = P._affine_tables(
        coarse_points, coarse_nbr, triangles)
    vf = fine_points.shape[0]
    vpad = ((vf + block - 1) // block) * block
    fp = jnp.pad(fine_points, ((0, vpad - vf), (0, 0)))
    pp = jnp.pad(parents, (0, vpad - vf))

    def run_block(args):
        f, par = args
        if mode == "full":
            return P._prolongation_block_affine(
                f, par, coarse_points, coarse_nbr, packed_rot, enc,
                nbr_planes, P.BARYCENTRIC)
        px, py, pz = f[:, 0], f[:, 1], f[:, 2]
        cand = enc[par]
        tvalid = cand != INVALID_INDEX
        prow = packed_rot[jnp.where(tvalid, cand, 0)]
        pt = jnp.swapaxes(prow, 1, 2)
        lane = lambda k: pt[:, k, :]
        b0 = (lane(0) * px[:, None] + lane(1) * py[:, None]
              + lane(2) * pz[:, None] + lane(3))
        b1 = (lane(4) * px[:, None] + lane(5) * py[:, None]
              + lane(6) * pz[:, None] + lane(7))
        b2 = 1.0 - b0 - b1
        hit = tvalid & (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0)
        first = jnp.argmax(hit, axis=1)[:, None]
        take1 = lambda a: jnp.take_along_axis(a, first, axis=1)[:, 0]
        if mode == "hit_only":
            return (jnp.stack([take1(b0), take1(b1), take1(b2)], axis=1),
                    jnp.any(hit, axis=1))
        if mode == "gather_only":
            return (jnp.sum(b0, axis=1) + jnp.sum(b1, axis=1),
                    jnp.any(tvalid, axis=1))
        raise ValueError(mode)

    out = jax.lax.map(run_block,
                      (fp.reshape(-1, block, 3), pp.reshape(-1, block)))
    return out


def main():
    pts = torus_points(N, seed=1).astype(np.float32)
    pts = pts[morton_order(pts)]
    graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
    assert not bool(short)
    cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
    caps = plan_levels(N, cfg)
    cap = caps[0]
    kc_cap = 48
    radius = sampling_radius(graph, cfg.reduction_ratio)
    bd, bd_ovf = graph_minplus_operator(graph)
    mask, _ = fast_disc_sample_chained(graph, radius, bd=bd, bd_ovf=bd_ovf)
    raw = jnp.nonzero(mask, size=cap, fill_value=N)[0]
    samples = jnp.where(raw < N, raw, INVALID_INDEX).astype(jnp.int32)
    parents = assign_parents_bd(graph, samples, bd=bd, bd_ovf=bd_ovf)[0]
    columns = extract_coarse_edges_local(graph, parents, cap,
                                         min(kc_cap, cap - 1),
                                         sync_retry=False)[0]
    cpts = coarse_from_mean_of_fine_children(graph, parents, samples)
    cg = coarse_graph(columns, cpts)
    tris, _ = construct_voronoi_triangles(cg, 4 * cap, 4 * kc_cap)
    jax.block_until_ready(tris.assoc)
    a_max = tris.assoc.shape[1]
    print(f"n={N} cap={cap} A={a_max} kc={cg.neighbors.shape[1]}",
          flush=True)

    args = (graph.points, parents, cpts, cg.neighbors, tris)
    timed("full affine kernel", lambda: ablated(*args, mode="full"))
    timed("hit scan only (no fallbacks)",
          lambda: ablated(*args, mode="hit_only"))
    timed("gather + b only (no argmax/select)",
          lambda: ablated(*args, mode="gather_only"))

    # A sliced to 32: how much does candidate width cost?
    tris32 = tris._replace(assoc=tris.assoc[:, :32],
                           assoc_rot=tris.assoc_rot[:, :32])
    args32 = (graph.points, parents, cpts, cg.neighbors, tris32)
    timed("full kernel, A=32 slice",
          lambda: ablated(*args32, mode="full"))
    timed("gather+b only, A=32 slice",
          lambda: ablated(*args32, mode="gather_only"))

    # How many parents actually have > 32 associated triangles?
    acounts = jnp.sum(tris.assoc != INVALID_INDEX, axis=1)
    pcounts = acounts[jnp.where(parents >= 0, parents, 0)]
    n_over = int(jnp.sum(pcounts > 32))
    print(f"assoc counts: mean={float(jnp.mean(acounts)):.1f} "
          f"p99={float(jnp.percentile(acounts.astype(jnp.float32), 99)):.0f} "
          f"max={int(jnp.max(acounts))}; fine points with parent assoc "
          f">32: {n_over} ({100 * n_over / N:.2f}%)", flush=True)


if __name__ == "__main__":
    main()

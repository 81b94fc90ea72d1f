"""Focused per-stage attribution of the DEFAULT 1M device build.

profile_buildstages.py times level-0 stages with the anti-hoisting
fori_loop slope protocol, but (a) it also times non-default stages
(stream RAP, priority sampling) that eat the TPU budget at 1M, and
(b) it never measures LEVEL-1 shapes -- which the static level plan
pads to 423808 rows x K=48 (vs the 131k real coarse vertices), so
level-1 stages can cost as much as level 0.

This script times only the default path (chained sampling -> shared
min-plus operator -> parents -> ece_local -> placement -> triangles ->
prolongation -> 2phase RAP -> restriction -> cheb), eagerly
(best-of-R wall with a D2H probe as the completion barrier; stage
costs are 0.1-10 s so the ~48 ms degraded-dispatch tax is noise), at
BOTH level-0 and padded level-1 shapes, plus the block-dense operator
conversions that PROGRESS.md flags as a remaining V^1.7 term.

Usage: python scripts/profile_build1m_v2.py [n=1000000] [reps=3]
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
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.hierarchy_static import (plan_levels, rap_cap_for_level,
                                          rap_y_width_for_level)
from gravomg_tpu.coarsen.sampling import (fast_disc_sample_chained,
                                          sampling_radius)
from gravomg_tpu.coarsen.parents import (assign_parents_bd,
                                         graph_minplus_operator)
from gravomg_tpu.coarsen.graph import coarse_graph, extract_coarse_edges_local
from gravomg_tpu.coarsen.placement import coarse_from_mean_of_fine_children
from gravomg_tpu.prolong.triangles import construct_voronoi_triangles
from gravomg_tpu.prolong.operator import (build_restriction,
                                          construct_prolongation)
from gravomg_tpu.solve.rap2 import galerkin_rap_2phase
from gravomg_tpu.solve.smoothers import ChebyshevParams
from gravomg_tpu.types import INVALID_INDEX

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def probe(x):
    """D2H completion barrier."""
    leaves = jax.tree_util.tree_leaves(x)
    a = leaves[0]
    return float(jnp.sum(jnp.ravel(a)[:4].astype(jnp.float32)))


def timed(name, fn, reps=REPS):
    try:
        out = fn()
        probe(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            probe(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:34s} {best*1000:10.2f} ms", flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"# {name} failed: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def level_stages(tag, graph, op, cap, kc_cap, cfg, fine_valid=None,
                 rap_cap=64, rap_y_width=24):
    """Time every default-path stage of ONE coarsening level."""
    radius = sampling_radius(graph, cfg.reduction_ratio)
    v = graph.num_vertices
    if fine_valid is None:
        fine_valid = jnp.ones((v,), bool)

    bd_pair = timed(f"{tag} minplus_operator (conv)",
                    lambda: graph_minplus_operator(graph))
    bd, bd_ovf = bd_pair

    mask_pair = timed(f"{tag} sampling rounds (bd reuse)",
                      lambda: fast_disc_sample_chained(
                          graph, radius, bd=bd, bd_ovf=bd_ovf))
    mask = mask_pair[0] & fine_valid
    raw = jnp.nonzero(mask, size=cap, fill_value=v)[0]
    samples = jnp.where(raw < v, raw, INVALID_INDEX).astype(jnp.int32)

    par_t = timed(f"{tag} parents sweeps (bd reuse)",
                  lambda: assign_parents_bd(graph, samples, bd=bd,
                                            bd_ovf=bd_ovf))
    parents = par_t[0]

    cols_pair = timed(f"{tag} ece_local",
                      lambda: extract_coarse_edges_local(
                          graph, parents, cap, min(kc_cap, cap - 1),
                          fine_valid=fine_valid, sync_retry=False))
    columns = cols_pair[0]

    cpts = timed(f"{tag} placement",
                 lambda: coarse_from_mean_of_fine_children(
                     graph, parents, samples, fine_valid=fine_valid))
    cg = coarse_graph(columns, cpts)
    t_max, a_max = 2 * cap, 2 * min(kc_cap, cap - 1)  # builder defaults

    tris_pair = timed(f"{tag} voronoi_triangles",
                      lambda: construct_voronoi_triangles(cg, t_max, a_max))
    tris = tris_pair[0]

    u_pair = timed(f"{tag} prolongation",
                   lambda: construct_prolongation(
                       graph.points, parents, cpts, cg.neighbors, tris,
                       scheme=cfg.weighting))
    u = u_pair[0]

    r_cap = rap_cap_for_level(cap, rap_cap)
    y_w = rap_y_width_for_level(op.num_vertices, op.max_degree,
                                rap_y_width)
    rap_pair = timed(f"{tag} galerkin_rap_2phase",
                     lambda: galerkin_rap_2phase(op, u, r_cap, y_width=y_w))
    coarse_op = rap_pair[0]

    ut_cap = min(-(-max(8, 12 * 3 * u.n_fine // u.n_coarse) // 8) * 8,
                 u.n_fine)
    timed(f"{tag} build_restriction",
          lambda: build_restriction(u, ut_cap))
    timed(f"{tag} cheb_params",
          lambda: ChebyshevParams.from_operator(op, cfg.chebyshev_ratio))
    return samples, parents, cg, u, coarse_op


def main():
    pts = torus_points(N, seed=1).astype(np.float32)
    pts = pts[morton_order(pts)]
    graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
    assert not bool(short)
    spd, _ = g.screened_poisson_operator(graph, alpha="auto")
    cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
    caps = plan_levels(N, cfg)
    print(f"n={N} levels_plan={caps}", flush=True)

    kc_cap = 48
    s0, p0, cg0, u0, op1 = level_stages("L0", graph, spd, caps[0], kc_cap,
                                        cfg)

    if len(caps) > 1:
        # Level 1 runs on the PADDED cap-sized coarse graph exactly as
        # the zero-D2H builder sees it.
        level_stages("L1", cg0, op1, caps[1], kc_cap, cfg,
                     fine_valid=s0 != INVALID_INDEX)


if __name__ == "__main__":
    main()

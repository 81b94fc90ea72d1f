"""Bisect which 1M pipeline stage asynchronously kills the TPU worker.

Usage: python scripts/bisect_1m.py STAGE_DEPTH [N]
Stages: 1 knn, 2 laplacian, 3 sampling, 4 parents, 5 extract,
        6 placement+coarse_graph, 7 triangles, 8 prolongation, 9 rap,
        10 cheb+chol (level 0 only)
Runs to the given depth, then performs a tiny D2H to surface deferred
failures.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.bench_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
import gravomg_tpu as g
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.hierarchy_static import plan_levels
from gravomg_tpu.coarsen.sampling import (fast_disc_sample_priority,
                                          sampling_radius)
from gravomg_tpu.coarsen.parents import assign_parents_bd
from gravomg_tpu.coarsen.graph import coarse_graph, extract_coarse_edges
from gravomg_tpu.coarsen.placement import coarse_from_mean_of_fine_children
from gravomg_tpu.prolong.triangles import construct_voronoi_triangles
from gravomg_tpu.prolong.operator import construct_prolongation
from gravomg_tpu.solve.rap import galerkin_rap
from gravomg_tpu.solve.coarse import factor_coarse
from gravomg_tpu.solve.smoothers import ChebyshevParams
from gravomg_tpu.types import INVALID_INDEX


def main(depth: int, n: int = 1_000_000):
    from gravomg_tpu.geometry.meshes import torus_points
    from gravomg_tpu.geometry.order import morton_order
    pts = torus_points(n, seed=1).astype(np.float32)
    pts = pts[morton_order(pts)]
    cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
    keep = []

    graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
    last = graph.distances
    if depth >= 2:
        lap, mass = g.graph_laplacian(graph, "invdist")
        spd = lap._replace(diag=lap.diag + 0.5 * mass)
        last = spd.diag
    if depth >= 3:
        radius = sampling_radius(graph, cfg.reduction_ratio)
        mask, _ = fast_disc_sample_priority(graph, radius)
        cap = plan_levels(n, cfg)[0]
        raw = jnp.nonzero(mask, size=cap, fill_value=n)[0]
        samples = jnp.where(raw < n, raw, INVALID_INDEX).astype(jnp.int32)
        last = samples
    if depth >= 4:
        parents, _, _ = assign_parents_bd(graph, samples)
        last = parents
    if depth >= 5:
        columns, e_ovf = extract_coarse_edges(graph, parents, cap, 47)
        last = columns
    if depth >= 6:
        cp = coarse_from_mean_of_fine_children(
            graph, parents, samples, fine_valid=jnp.ones(n, bool))
        cg = coarse_graph(columns, cp)
        last = cg.distances
    if depth >= 7:
        tris, t_ovf = construct_voronoi_triangles(cg, 4 * cap, 4 * 47)
        last = tris.assoc
    if depth >= 8:
        u, counts, _ = construct_prolongation(
            graph.points, parents, cp, cg.neighbors, tris,
            scheme=cfg.weighting)
        last = u.weights
    if depth >= 9:
        cop, r_ovf = galerkin_rap(spd, u, 96)
        last = cop.diag
    if depth >= 10:
        cheb = ChebyshevParams.from_operator(cop)
        last = cheb.lam_max

    jax.block_until_ready(last)
    print(f"depth {depth}: blocked ok", flush=True)
    v = float(jnp.sum(jnp.abs(jnp.ravel(last)[:8].astype(jnp.float32))))
    print(f"depth {depth}: D2H OK value={v}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2
         else 1_000_000)

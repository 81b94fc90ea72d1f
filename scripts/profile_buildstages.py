"""Per-stage execution cost of the device-resident hierarchy build.

bench.py r3 measured build_exec = 32.2 s at 200k (execution-only,
repeat-difference) against a 7.6 s csrc sequential CPU build and the
<1 s @ 1M BASELINE target.  This attributes that time: each stage of
``build_hierarchy_device`` (level-0 sizes; level-1+ are ~7x smaller) is
timed in isolation with the same repeat-difference slope protocol, on
REAL inputs produced by a single-level build.

Anti-hoisting: each stage's inputs are perturbed by a loop-carried
scalar (adding ``s * 1e-30`` to a float input), and the carry is
updated from the stage's output, so XLA cannot lift the stage out of
the timing loop or CSE the repeats.

Usage: python scripts/profile_buildstages.py [n=200000] [n1=1] [n2=3]
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
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.hierarchy_static import (build_hierarchy_device,
                                          plan_levels)
from gravomg_tpu.coarsen.sampling import (fast_disc_sample_priority,
                                          sampling_radius)
from gravomg_tpu.coarsen.parents import assign_parents_bd
from gravomg_tpu.coarsen.graph import (coarse_graph, extract_coarse_edges,
                                       extract_coarse_edges_local)
from gravomg_tpu.coarsen.placement import coarse_from_mean_of_fine_children
from gravomg_tpu.prolong.triangles import construct_voronoi_triangles
from gravomg_tpu.prolong.operator import (build_restriction,
                                          construct_prolongation)
from gravomg_tpu.solve.rap import galerkin_rap
from gravomg_tpu.solve.rap2 import galerkin_rap_local
from gravomg_tpu.solve.smoothers import estimate_lambda_max
from gravomg_tpu.solve.coarse import factor_coarse
from gravomg_tpu.solve.vcycle import (attach_fast_operators,
                                      attach_slab_operators)
from gravomg_tpu.types import INVALID_INDEX

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
N1 = int(sys.argv[2]) if len(sys.argv) > 2 else 1
N2 = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def slope_s(stage_fn, n1=N1, n2=N2, reps=3):
    """stage_fn(s: scalar f32) -> scalar f32 (perturb inputs by s,
    reduce outputs back to a scalar).  Returns per-execution seconds."""
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(s, iters):
        return jax.lax.fori_loop(0, iters, lambda _, s: stage_fn(s), s)

    def timed(iters):
        out = run(jnp.float32(0.0), iters)
        float(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(jnp.float32(0.0), iters)
            float(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1)


def rec(name, stage_fn, **kw):
    try:
        v = slope_s(stage_fn, **kw)
        print(f"{name:26s} {v*1000:10.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# {name} failed: {type(e).__name__}: {str(e)[:150]}",
              flush=True)


def red(x):
    return jnp.sum(jnp.ravel(x)[:8].astype(jnp.float32)) * 1e-30


def main():
    pts = torus_points(N, seed=1).astype(np.float32)
    pts = pts[morton_order(pts)]
    graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
    assert not bool(short)
    lap, mass = g.graph_laplacian(graph, "invdist")
    spd = lap._replace(diag=lap.diag + 0.5 * mass)
    cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
    caps = plan_levels(N, cfg)
    cap = caps[0]
    kc_cap = min(48, cap - 1)

    # Real level-0 artifacts (one coarsening).
    radius = sampling_radius(graph, cfg.reduction_ratio)
    mask, _ = fast_disc_sample_priority(graph, radius, seed=0)
    raw = jnp.nonzero(mask, size=cap, fill_value=graph.num_vertices)[0]
    samples = jnp.where(raw < graph.num_vertices, raw,
                        INVALID_INDEX).astype(jnp.int32)
    parents, _, _ = assign_parents_bd(graph, samples)
    fine_valid = jnp.ones((graph.num_vertices,), bool)
    columns, _ = extract_coarse_edges(graph, parents, cap, kc_cap,
                                      fine_valid=fine_valid)
    cpts = coarse_from_mean_of_fine_children(graph, parents, samples,
                                             fine_valid=fine_valid)
    cg = coarse_graph(columns, cpts)
    t_max, a_max = 4 * cap, 4 * kc_cap
    tris, _ = construct_voronoi_triangles(cg, t_max, a_max)
    u, _, _ = construct_prolongation(graph.points, parents, cpts,
                                  cg.neighbors, tris,
                                  scheme=cfg.weighting)
    ut_cap = min(-(-max(8, 12 * 3 * u.n_fine // u.n_coarse) // 8) * 8,
                 u.n_fine)
    jax.block_until_ready(u.weights)
    print(f"n={N} cap={cap} kc_cap={kc_cap} levels_plan={caps}",
          flush=True)

    def perturb_graph(s):
        # Touch every input XLA could otherwise constant-fold a stage
        # around: distances, points, AND parents (int stages depend on
        # parents only; s*1e-30 truncates to a traced runtime 0).
        return graph._replace(distances=graph.distances + s,
                              points=graph.points + s)

    def perturb_parents(s):
        return parents + jnp.int32(s * 1e-30)

    if N <= 500_000:
        # Not the build default; its single-launch fixpoint exceeds the
        # device watchdog at 1M (crashed the worker on the v2 run).
        rec("sampling_priority", lambda s: red(
            fast_disc_sample_priority(perturb_graph(s), radius + s)[0]))

    from gravomg_tpu.coarsen.parents import graph_minplus_operator
    from gravomg_tpu.coarsen.sampling import fast_disc_sample_chained
    rec("sampling_chained", lambda s: red(
        fast_disc_sample_chained(perturb_graph(s), radius + s)[0]))

    def chained_pair(s):
        # The builder's real shape: ONE shared operator conversion
        # feeding both sampling rounds and parent sweeps.
        gp = perturb_graph(s)
        bd, bo = graph_minplus_operator(gp)
        m, _ = fast_disc_sample_chained(gp, radius + s, bd=bd, bd_ovf=bo)
        p, _, _ = assign_parents_bd(gp, samples, bd=bd, bd_ovf=bo)
        return red(m) + red(p)

    rec("chained sample+parents", chained_pair)
    rec("assign_parents_bd", lambda s: red(
        assign_parents_bd(perturb_graph(s), samples)[0]))
    rec("extract_coarse_edges", lambda s: red(
        extract_coarse_edges(perturb_graph(s), perturb_parents(s), cap,
                             kc_cap, fine_valid=fine_valid)[0]))
    rec("extract_edges_local", lambda s: red(
        extract_coarse_edges_local(perturb_graph(s), perturb_parents(s),
                                   cap, kc_cap, fine_valid=fine_valid,
                                   sync_retry=False)[0]))
    rec("coarse_placement", lambda s: red(
        coarse_from_mean_of_fine_children(perturb_graph(s),
                                          perturb_parents(s), samples,
                                          fine_valid=fine_valid)))
    rec("voronoi_triangles", lambda s: red(
        construct_voronoi_triangles(
            cg._replace(distances=cg.distances + s,
                        points=cg.points + s), t_max,
            a_max)[0].vertices))
    rec("prolongation", lambda s: red(
        construct_prolongation(graph.points + s, parents, cpts,
                               cg.neighbors, tris,
                               scheme=cfg.weighting)[0].weights))
    rec("galerkin_rap", lambda s: red(
        galerkin_rap(spd._replace(diag=spd.diag + s), u,
                     min(128, cap))[0].offdiag))
    from gravomg_tpu.solve.rap2 import galerkin_rap_2phase
    rec("galerkin_rap_2phase", lambda s: red(
        galerkin_rap_2phase(spd._replace(diag=spd.diag + s), u,
                            min(128, cap), y_width=24)[0].offdiag))
    if N <= 100_000:
        # The mc*yw-lane merge OOMs the remote compiler above ~100k
        # rows (repeatable SIGKILL; each attempt wastes ~30 min).
        rec("galerkin_rap_local", lambda s: red(
            galerkin_rap_local(spd._replace(diag=spd.diag + s), u,
                               min(128, cap), sync_retry=False)[0].offdiag))
    rec("build_restriction", lambda s: red(
        build_restriction(u._replace(weights=u.weights + s),
                          ut_cap)[0].weights))
    rec("cheb_lambda(31 spmv)", lambda s: jnp.float32(
        estimate_lambda_max(spd._replace(diag=spd.diag + s))) * 1e-30)

    # Whole-build execution cross-check against bench build_exec.
    # EAGER (staged launches, like the real builder): wrapping the
    # whole build in one jitted fori_loop OOMs the remote compiler
    # (the unrolled RAP sort alone is a ~500 MB HLO).
    def whole_eager(label, **kw):
        try:
            t_best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                h, _ = build_hierarchy_device(graph, spd, cfg, **kw)
                float(jnp.sum(h.solver.levels[-1].op.diag))
                t_best = min(t_best, time.perf_counter() - t0)
            print(f"{label:26s} {t_best*1000:10.2f} ms (eager best-of-3)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"# {label} failed: {type(e).__name__}: {str(e)[:150]}",
                  flush=True)

    whole_eager("WHOLE build (default)")
    whole_eager("WHOLE build (stream rap)", rap_mode="stream",
                chained_sampling=False)


if __name__ == "__main__":
    main()

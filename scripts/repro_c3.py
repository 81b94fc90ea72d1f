"""Stage-attributed repro of the c3 (170k heat) TPU-worker crash.

Round 3 and the first round-4 sweep both lost the worker somewhere
after the 170k build completed (breadcrumbs end at 'coarse
factorization').  This script runs the c3 pipeline one phase at a
time with a D2H barrier and a print after EACH phase, so the crash
names its stage.  Run under `timeout`; pass a size to override 170k.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
import gravomg_tpu as g
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.geometry.laplacian import graph_laplacian
from gravomg_tpu.hierarchy_static import (build_hierarchy_device,
                                          check_diagnostics,
                                          compact_solver)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 170_000


def stage(name, t0=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[{now - t0[0]:8.1f}s] {name}", flush=True)


stage(f"start n={N}")
cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
pts = torus_points(N, seed=3)
pts = pts[morton_order(pts)].astype(np.float32)
graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
assert not bool(short)
spd, mass_ = g.screened_poisson_operator(graph, alpha="auto")
stage("graph+operator")

h, diags = build_hierarchy_device(graph, spd, cfg)
probe = float(jnp.sum(h.solver.levels[-1].op.diag))
check_diagnostics(diags)
stage("build")

sol = compact_solver(h.solver, diags)
probe = float(jnp.sum(sol.levels[-1].op.diag))
stage("compact")

h = None
import gc
gc.collect()
stage("drop build hierarchy")

from gravomg_tpu.apps.heat import refit_hierarchy

lap, mass = graph_laplacian(graph, "invdist")
probe = float(jnp.sum(mass[:4]))
stage("laplacian")

mean_edge = float(jnp.sum(jnp.where(graph.mask, graph.distances, 0.0))
                  / jnp.sum(graph.mask))
t = mean_edge ** 2
heat_op = lap._replace(diag=lap.diag * t + mass, offdiag=lap.offdiag * t)
sh = refit_hierarchy(sol, heat_op, cfg)
probe = float(jnp.sum(sh.levels[-1].op.diag))
stage("refit heat operator")

delta = jnp.zeros(graph.num_vertices, jnp.float32).at[0].set(1.0)
# mg_pcg, as the app now does: the stationary solve at a 1e-8 tol
# exhausts max_cycles in ONE while_loop launch (f32 floor ~4e-5) and
# the watchdog kills the worker -- THE c3 crash, attributed here.
u, rel, it = g.mg_pcg(sh, mass * delta, cfg)
probe = float(jnp.sum(u[:4]))
stage(f"heat solve rel={float(rel):.2e} it={int(it)}")

sh = None
gc.collect()
mask = graph.mask
safe = graph.safe_neighbors()
d = jnp.where(mask, graph.distances, jnp.inf)
grad = (u[safe] - u[:, None]) / d
xdir = -jnp.sign(grad)
w = jnp.where(mask, 1.0 / jnp.maximum(d, 1e-8), 0.0)
div = jnp.sum(w * xdir, axis=1)
probe = float(jnp.sum(div[:4]))
stage("gradient/divergence")

pois_op = lap._replace(diag=lap.diag + 1e-4 * jnp.mean(lap.diag) / jnp.mean(mass) * mass)
ph = refit_hierarchy(sol, pois_op, cfg)
probe = float(jnp.sum(ph.levels[-1].op.diag))
stage("refit poisson operator")

phi, rel, it = g.mg_pcg(ph, div - jnp.mean(div), cfg)
probe = float(jnp.sum(phi[:4]))
stage(f"poisson solve rel={float(rel):.2e} it={int(it)}")
print("c3 repro: ALL STAGES OK", flush=True)

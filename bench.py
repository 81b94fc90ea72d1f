"""Benchmark driver: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric (BASELINE.md): per-V-cycle wall time on a screened-
Poisson problem at GRAVOMG_BENCH_N vertices (default 500k; BASELINE
config-4 class), measured on the TPU with the fully device-resident
pipeline (grid kNN -> Laplacian -> hierarchy -> V-cycles).

Timing methodology -- two properties of this TPU runtime force it
(measured, PROGRESS.md):
  * any device-to-host transfer permanently degrades the process to
    ~48 ms/launch, and
  * `block_until_ready` does not track true kernel completion, so
    naive chain timings read unphysically fast.
Each measurement therefore runs in a FRESH subprocess that executes the
warm pipeline plus N chained V-cycles and ends with one forced readout
(the only reliable completion barrier); two runs with different N give
the true per-cycle slope:  t_per_cycle = (T(N2) - T(N1)) / (N2 - N1).
The same protocol times the full warm build.

``vs_baseline`` is the speedup over a SciPy-CSR CPU implementation of
the same V-cycle on the same-algorithm hierarchy -- the stand-in for
the reference's C++/Eigen CPU execution model (the reference ships no
solver or benchmarks, BASELINE.md).  All subprocess results are cached
under .bench_cache/.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")
BENCH_N = int(os.environ.get("GRAVOMG_BENCH_N", "200000"))
N1 = int(os.environ.get("GRAVOMG_BENCH_C1", "2"))
N2 = int(os.environ.get("GRAVOMG_BENCH_C2", "12"))

_TPU_SCRIPT = r"""
import json, sys, time, gc, functools
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[4])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import gravomg_tpu as g
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.hierarchy_static import (build_hierarchy_device,
                                          check_diagnostics)

n, n1, n2, out = (int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
                  sys.argv[5])
pts = torus_points(n, seed=1).astype(np.float32)
cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")

graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
lap, mass = g.graph_laplacian(graph, "invdist")
spd = lap._replace(diag=lap.diag + 0.5 * mass)
t0 = time.perf_counter()
h, diags = build_hierarchy_device(graph, spd, cfg)
# This D2H probe is the only reliable completion barrier (block_until_
# ready does not track true completion on this runtime).  It includes
# async remote-compile time on cold caches; t_build is therefore an
# upper bound, honest only on warm caches.
probe = float(jnp.sum(h.solver.levels[-1].op.diag))
t_build = time.perf_counter() - t0
# The process is now in ~48ms-per-launch dispatch mode.  Both cycle
# measurements below are SINGLE-launch programs (fori_loop inside one
# jit), so the constant per-launch cost cancels in the slope and the
# difference isolates true per-cycle execution.
b = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)

@functools.partial(jax.jit, static_argnames=("cycles",))
def run_cycles(hs, b, cycles):
    def body(_, x):
        return g.v_cycle(hs, x, b, cfg)
    return jax.lax.fori_loop(0, cycles, body, jnp.zeros_like(b))

def timed(cycles, reps=5):
    x = run_cycles(h.solver, b, cycles)      # compile + first exec
    float(jnp.sum(x[:4]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        x = run_cycles(h.solver, b, cycles)
        float(jnp.sum(x[:4]))                # completion barrier
        best = min(best, time.perf_counter() - t0)
    return best, x

t1, _ = timed(n1)
t2, x = timed(n2)

assert not bool(short), "grid kNN shortfall"
check_diagnostics(diags)
rel = float(jnp.linalg.norm(b - g.spmv(h.solver.levels[0].op, x))
            / jnp.linalg.norm(b))
json.dump({"t_build": t_build, "t1": t1, "t2": t2, "n1": n1, "n2": n2,
           "residual": rel,
           "levels": [int(d.n_real) for d in diags]}, open(out, "w"))
"""

_BASELINE_SCRIPT = r"""
import json, sys, time
import numpy as np
import jax.numpy as jnp
import gravomg_tpu as g
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.hierarchy_static import build_hierarchy_device
import scipy.sparse as sp
import scipy.linalg as sla

n, out_json = int(sys.argv[1]), sys.argv[2]
# CSR V-cycle cost is linear in nnz; measure at a capped size and scale
# (conservative for the CPU).
nb = min(n, 200000)
pts = torus_points(nb, seed=1).astype(np.float32)
graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
assert not bool(short)
lap, mass = g.graph_laplacian(graph, "invdist")
spd = lap._replace(diag=lap.diag + 0.5*mass)
cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
h, diags = build_hierarchy_device(graph, spd, cfg)

def ell_to_csr(op):
    v_, k_ = op.neighbors.shape
    nbr = np.asarray(op.neighbors); off = np.asarray(op.offdiag)
    mask = nbr != g.INVALID_INDEX
    rows = np.repeat(np.arange(v_), k_)[mask.ravel()]
    cols = nbr.ravel()[mask.ravel()]
    m = sp.csr_matrix((off.ravel()[mask.ravel()], (rows, cols)),
                      shape=(v_, v_))
    return m + sp.diags(np.asarray(op.diag))

def u_to_csr(u):
    vf = u.cols.shape[0]
    rows = np.repeat(np.arange(vf), 3)
    return sp.csr_matrix((np.asarray(u.weights).ravel(),
                          (rows, np.asarray(u.cols).ravel())),
                         shape=(vf, u.n_coarse))

As = [ell_to_csr(l.op) for l in h.solver.levels]
Us = [u_to_csr(l.u) for l in h.solver.levels[:-1]]
Dinv = [1.0 / A.diagonal() for A in As]
chol = sla.cho_factor(As[-1].toarray()
                      + 1e-10*np.abs(As[-1].diagonal()).max()
                      * np.eye(As[-1].shape[0]))

def vcycle_cpu(lvl, x, b):
    if lvl == len(As) - 1:
        return sla.cho_solve(chol, b)
    A, dinv, U = As[lvl], Dinv[lvl], Us[lvl]
    for _ in range(cfg.pre_smooth):
        x = x + cfg.jacobi_omega * dinv * (b - A @ x)
    r = b - A @ x
    e = vcycle_cpu(lvl + 1, np.zeros(U.shape[1]), U.T @ r)
    x = x + U @ e
    for _ in range(cfg.post_smooth):
        x = x + cfg.jacobi_omega * dinv * (b - A @ x)
    return x

b = np.random.default_rng(0).standard_normal(nb)
x = vcycle_cpu(0, np.zeros(nb), b)
t0 = time.perf_counter()
for _ in range(20):
    x = vcycle_cpu(0, x, b)
cpu_ms = (time.perf_counter() - t0) / 20 * 1000 * (n / nb)
json.dump({"cpu_vcycle_ms": cpu_ms, "baseline_n": nb}, open(out_json, "w"))
"""


def run_tpu(n: int, n1: int, n2: int) -> dict:
    os.makedirs(CACHE, exist_ok=True)
    out = os.path.join(CACHE, f"tpu_slope_{n}_{n1}_{n2}.json")
    if not os.path.exists(out):
        subprocess.run(
            [sys.executable, "-c", _TPU_SCRIPT, str(n), str(n1), str(n2),
             os.path.join(CACHE, "xla"), out], check=True, cwd=REPO)
    return json.load(open(out))


def cpu_baseline(n: int) -> dict:
    os.makedirs(CACHE, exist_ok=True)
    meta = os.path.join(CACHE, f"baseline_{n}.json")
    if not os.path.exists(meta):
        env = dict(os.environ)
        env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": "",
                    "JAX_ENABLE_X64": "0"})
        subprocess.run([sys.executable, "-c", _BASELINE_SCRIPT, str(n),
                        meta], check=True, env=env, cwd=REPO)
    return json.load(open(meta))


def main():
    meta = cpu_baseline(BENCH_N)
    r = run_tpu(BENCH_N, N1, N2)
    tpu_ms = (r["t2"] - r["t1"]) / (r["n2"] - r["n1"]) * 1000
    tpu_ms = max(tpu_ms, 1e-4)
    out = {
        "metric": f"vcycle_ms_{BENCH_N}v",
        "value": round(tpu_ms, 4),
        "unit": "ms",
        "vs_baseline": round(meta["cpu_vcycle_ms"] / tpu_ms, 3),
    }
    print(json.dumps(out))
    print(f"# build_upper_bound={r['t_build']:.3f}s "
          f"cpu_vcycle={meta['cpu_vcycle_ms']:.2f}ms "
          f"(cpu measured at {meta['baseline_n']}v, scaled linearly) "
          f"tpu_vcycle={tpu_ms:.4f}ms "
          f"T({r['n1']})={r['t1']:.3f}s T({r['n2']})={r['t2']:.3f}s "
          f"residual={r['residual']:.2e} "
          f"levels={r['levels']}", file=sys.stderr)


if __name__ == "__main__":
    main()

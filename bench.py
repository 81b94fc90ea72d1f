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
BENCH_N = int(os.environ.get("GRAVOMG_BENCH_N", "500000"))
N1 = int(os.environ.get("GRAVOMG_BENCH_C1", "3"))
N2 = int(os.environ.get("GRAVOMG_BENCH_C2", "43"))

_TPU_SCRIPT = r"""
import json, sys, time, gc
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

n, cycles, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
pts = torus_points(n, seed=1).astype(np.float32)
cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")

def full_build():
    graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
    lap, mass = g.graph_laplacian(graph, "invdist")
    spd = lap._replace(diag=lap.diag + 0.5 * mass)
    h, diags = build_hierarchy_device(graph, spd, cfg)
    return h, diags, short

# Warm pass compiles everything (cached across subprocesses).
h, diags, short = full_build()
jax.block_until_ready(h.solver.coarse_chol)
del h, diags, short
gc.collect()

# Timed warm build, closed by a readout-forced barrier.
t0 = time.perf_counter()
h, diags, short = full_build()
probe = float(jnp.sum(h.solver.levels[-1].op.diag))  # forces completion
t_build = time.perf_counter() - t0
# The process is now in degraded dispatch mode (that readout was a
# D2H): the V-cycle chain below still executes correctly, and its
# timing is closed by its own readout; the constant degraded-dispatch
# overhead cancels in the two-point slope.
b = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)

@jax.jit
def step(hs, x, b):
    return g.v_cycle(hs, x, b, cfg)

x = step(h.solver, jnp.zeros_like(b), b)
jax.block_until_ready(x)
t0 = time.perf_counter()
x = jnp.zeros_like(b)
for _ in range(cycles):
    x = step(h.solver, x, b)
tail = float(jnp.sum(x[:16]))   # completion barrier
t_cycles = time.perf_counter() - t0

assert not bool(short), "grid kNN shortfall"
check_diagnostics(diags)
rel = float(jnp.linalg.norm(b - g.spmv(h.solver.levels[0].op, x))
            / jnp.linalg.norm(b))
json.dump({"t_build": t_build, "t_cycles": t_cycles, "cycles": cycles,
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


def run_tpu(n: int, cycles: int) -> dict:
    os.makedirs(CACHE, exist_ok=True)
    out = os.path.join(CACHE, f"tpu_{n}_{cycles}.json")
    if not os.path.exists(out):
        subprocess.run(
            [sys.executable, "-c", _TPU_SCRIPT, str(n), str(cycles), out,
             os.path.join(CACHE, "xla")], check=True, cwd=REPO)
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
    r1 = run_tpu(BENCH_N, N1)
    r2 = run_tpu(BENCH_N, N2)
    tpu_ms = (r2["t_cycles"] - r1["t_cycles"]) / (N2 - N1) * 1000
    tpu_ms = max(tpu_ms, 1e-4)
    out = {
        "metric": f"vcycle_ms_{BENCH_N}v",
        "value": round(tpu_ms, 4),
        "unit": "ms",
        "vs_baseline": round(meta["cpu_vcycle_ms"] / tpu_ms, 3),
    }
    print(json.dumps(out))
    print(f"# warm_full_build={r2['t_build']:.3f}s "
          f"cpu_vcycle={meta['cpu_vcycle_ms']:.2f}ms "
          f"(cpu measured at {meta['baseline_n']}v, scaled linearly) "
          f"tpu_vcycle={tpu_ms:.4f}ms "
          f"residual_after_{N2}={r2['residual']:.2e} "
          f"levels={r2['levels']}", file=sys.stderr)


if __name__ == "__main__":
    main()

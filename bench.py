"""Benchmark driver: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric (BASELINE.md): per-V-cycle wall time on a Poisson
problem.  ``vs_baseline`` is the speedup over a CPU sparse (SciPy CSR)
implementation of the same V-cycle on the same hierarchy -- the stand-in
for the reference's C++/Eigen CPU execution model (the reference repo
itself ships no solver and no benchmarks, BASELINE.md; SciPy CSR kernels
are an optimized CPU sparse baseline of the same algorithm).

Flow: a clean-environment CPU subprocess builds the hierarchy (the
staged, sort-heavy part) and times the CPU baseline; the main process
(TPU under the axon tunnel) times the jitted V-cycle.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")
SUBDIV = int(os.environ.get("GRAVOMG_BENCH_SUBDIV", "6"))  # 6 -> 40962
CYCLES = int(os.environ.get("GRAVOMG_BENCH_CYCLES", "20"))

_BUILD_SCRIPT = r"""
import json, os, sys, time
import numpy as np
import jax.numpy as jnp
import gravomg_tpu as g
from gravomg_tpu.geometry.meshes import icosphere
from gravomg_tpu.io.serialization import save_solver

subdiv, out_npz, out_json, cycles = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], int(sys.argv[4]))
rng = np.random.default_rng(0)
v, f = icosphere(subdiv)
v = (v + rng.normal(scale=1e-3, size=v.shape)).astype(np.float32)

t0 = time.perf_counter()
graph = g.knn_graph(jnp.asarray(v), k=16)
t_knn = time.perf_counter() - t0
lap, mass = g.graph_laplacian(graph, "invdist")
spd = lap._replace(diag=lap.diag + 0.5 * mass)
t0 = time.perf_counter()
h = g.build_hierarchy(graph, spd, g.MultigridConfig(coarse_threshold=500))
t_build = time.perf_counter() - t0
save_solver(out_npz, h.solver)

# ---- CPU baseline: SciPy CSR V-cycle on the same hierarchy ----
import scipy.sparse as sp
import scipy.linalg as sla

levels = []
for lvl in h.solver.levels:
    a = sp.csr_matrix(np.asarray(lvl.op.as_dense())) if lvl.op.num_vertices <= 2000 else None
    levels.append(a)

def ell_to_csr(op):
    import numpy as np
    v_, k_ = op.neighbors.shape
    nbr = np.asarray(op.neighbors)
    off = np.asarray(op.offdiag)
    mask = nbr != g.INVALID_INDEX
    rows = np.repeat(np.arange(v_), k_)[mask.ravel()]
    cols = nbr.ravel()[mask.ravel()]
    vals = off.ravel()[mask.ravel()]
    m = sp.csr_matrix((vals, (rows, cols)), shape=(v_, v_))
    m += sp.diags(np.asarray(op.diag))
    return m

def u_to_csr(u):
    vf = u.cols.shape[0]
    rows = np.repeat(np.arange(vf), 3)
    m = sp.csr_matrix((np.asarray(u.weights).ravel(),
                       (rows, np.asarray(u.cols).ravel())),
                      shape=(vf, u.n_coarse))
    return m

As = [ell_to_csr(l.op) for l in h.solver.levels]
Us = [u_to_csr(l.u) for l in h.solver.levels[:-1]]
Dinv = [1.0 / A.diagonal() for A in As]
chol = sla.cho_factor(As[-1].toarray() + 1e-10*np.abs(As[-1].diagonal()).max()*np.eye(As[-1].shape[0]))
cfg = g.MultigridConfig()

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

b = rng.normal(size=v.shape[0])
x = np.zeros_like(b)
x = vcycle_cpu(0, x, b)  # warm caches
t0 = time.perf_counter()
for _ in range(cycles):
    x = vcycle_cpu(0, x, b)
cpu_ms = (time.perf_counter() - t0) / cycles * 1000
rel = np.linalg.norm(b - As[0] @ x) / np.linalg.norm(b)

json.dump({"cpu_vcycle_ms": cpu_ms, "t_knn_cpu": t_knn,
           "t_build_cpu": t_build, "n_fine": int(v.shape[0]),
           "levels": [int(l.op.num_vertices) for l in h.solver.levels],
           "cpu_residual_after": float(rel)}, open(out_json, "w"))
"""


def build_and_baseline(subdiv: int):
    os.makedirs(CACHE, exist_ok=True)
    npz = os.path.join(CACHE, f"bench_h{subdiv}.npz")
    meta = os.path.join(CACHE, f"bench_h{subdiv}.json")
    if not (os.path.exists(npz) and os.path.exists(meta)):
        env = dict(os.environ)
        env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": "",
                    "JAX_ENABLE_X64": "0"})
        subprocess.run([sys.executable, "-c", _BUILD_SCRIPT, str(subdiv),
                        npz, meta, str(CYCLES)],
                       check=True, env=env, cwd=REPO)
    return npz, json.load(open(meta))


def main():
    npz, meta = build_and_baseline(SUBDIV)

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(CACHE, "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    import gravomg_tpu as g
    from gravomg_tpu.io.serialization import load_solver

    h = load_solver(npz)
    cfg = g.MultigridConfig()
    n = h.levels[0].op.num_vertices
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=n), jnp.float32)

    # The hierarchy must be a jit ARGUMENT: closure-captured arrays are
    # baked as HLO constants and re-materialized per call (measured 1000x
    # slower under the axon runtime).
    @jax.jit
    def step(h, x, b):
        return g.v_cycle(h, x, b, cfg)

    x = step(h, jnp.zeros_like(b), b)
    x.block_until_ready()  # compile
    # Timed: chain CYCLES V-cycles.
    t0 = time.perf_counter()
    for _ in range(CYCLES):
        x = step(h, x, b)
    x.block_until_ready()
    tpu_ms = (time.perf_counter() - t0) / CYCLES * 1000

    a0 = h.levels[0].op
    rel = float(jnp.linalg.norm(b - g.spmv(a0, x)) / jnp.linalg.norm(b))

    out = {
        "metric": f"vcycle_ms_{meta['n_fine']}v",
        "value": round(tpu_ms, 4),
        "unit": "ms",
        "vs_baseline": round(meta["cpu_vcycle_ms"] / tpu_ms, 3),
    }
    print(json.dumps(out))
    print(f"# levels={meta['levels']} cpu_vcycle={meta['cpu_vcycle_ms']:.2f}ms "
          f"tpu_vcycle={tpu_ms:.2f}ms residual_after_{CYCLES}={rel:.2e} "
          f"build_cpu={meta['t_build_cpu']:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Benchmark driver: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric (BASELINE.md): per-V-cycle wall time on a screened-
Poisson problem at GRAVOMG_BENCH_N vertices (default 1M -- BASELINE
config 4 scale), measured on the TPU with the fully device-resident
pipeline (grid kNN -> Laplacian -> hierarchy -> V-cycles) and **no
device-to-host transfer before the timed region** (any D2H permanently
degrades this runtime's dispatch to ~48 ms/launch; PROGRESS.md).

``vs_baseline`` is the speedup over a SciPy-CSR CPU implementation of
the same V-cycle on the same-algorithm hierarchy -- the stand-in for
the reference's C++/Eigen CPU execution model (the reference ships no
solver or benchmarks, BASELINE.md).  The baseline runs in a clean-env
CPU subprocess and is cached.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")
BENCH_N = int(os.environ.get("GRAVOMG_BENCH_N", "1000000"))
CYCLES = int(os.environ.get("GRAVOMG_BENCH_CYCLES", "20"))

_BASELINE_SCRIPT = r"""
import json, sys, time
import numpy as np
import jax.numpy as jnp
import gravomg_tpu as g
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.geometry.meshes import torus_points
import scipy.sparse as sp
import scipy.linalg as sla

n, out_json, cycles = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
# The CPU baseline at full 1M would take ~an hour to build through the
# JAX-CPU pipeline; build at a capped size and scale linearly (CSR
# V-cycle cost is linear in nnz -- conservative for the CPU, which
# suffers no cache penalty from the scaling).
nb = min(n, 200000)
pts = torus_points(nb, seed=1).astype(np.float32)
graph, short = grid_knn_graph_nosync(pts, 16)
assert not bool(short)
lap, mass = g.graph_laplacian(graph, "invdist")
spd = lap._replace(diag=lap.diag + 0.5*mass)
cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
h, diags = __import__("gravomg_tpu.hierarchy_static", fromlist=["x"]).\
    build_hierarchy_device(graph, spd, cfg)

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
for _ in range(cycles):
    x = vcycle_cpu(0, x, b)
cpu_ms = (time.perf_counter() - t0) / cycles * 1000 * (n / nb)
json.dump({"cpu_vcycle_ms": cpu_ms, "baseline_n": nb,
           "scaled_to_n": n}, open(out_json, "w"))
"""


def cpu_baseline(n: int) -> dict:
    os.makedirs(CACHE, exist_ok=True)
    meta = os.path.join(CACHE, f"baseline_{n}.json")
    if not os.path.exists(meta):
        env = dict(os.environ)
        env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": "",
                    "JAX_ENABLE_X64": "0"})
        subprocess.run([sys.executable, "-c", _BASELINE_SCRIPT, str(n),
                        meta, str(CYCLES)], check=True, env=env, cwd=REPO)
    return json.load(open(meta))


def main():
    meta = cpu_baseline(BENCH_N)

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
    from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
    from gravomg_tpu.geometry.meshes import torus_points
    from gravomg_tpu.hierarchy_static import (build_hierarchy_device,
                                              check_diagnostics)

    pts = torus_points(BENCH_N, seed=1).astype(np.float32)
    cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")

    def full_build():
        graph, short = grid_knn_graph_nosync(pts, 16)
        lap, mass = g.graph_laplacian(graph, "invdist")
        spd = lap._replace(diag=lap.diag + 0.5 * mass)
        h, diags = build_hierarchy_device(graph, spd, cfg)
        return h, diags, short

    # Warm all compiles (cold pass), then time a full warm build.
    # Drop the cold-pass results first: holding them alive during the
    # rebuild doubles peak HBM and crashes the worker at 1M.
    h, diags, short = full_build()
    jax.block_until_ready(h.solver.coarse_chol)
    del h, diags, short
    import gc
    gc.collect()
    t0 = time.perf_counter()
    h, diags, short = full_build()
    jax.block_until_ready(h.solver.coarse_chol)
    build_s = time.perf_counter() - t0

    b = jnp.asarray(np.random.default_rng(0).normal(size=BENCH_N),
                    jnp.float32)

    @jax.jit
    def step(hs, x, b):
        return g.v_cycle(hs, x, b, cfg)

    x = step(h.solver, jnp.zeros_like(b), b)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(CYCLES):
        x = step(h.solver, x, b)
    jax.block_until_ready(x)
    tpu_ms = (time.perf_counter() - t0) / CYCLES * 1000

    # --- timing done; host syncs are safe now ---
    assert not bool(short), "grid kNN shortfall at bench scale"
    check_diagnostics(diags)
    rel = float(jnp.linalg.norm(b - g.spmv(h.solver.levels[0].op, x))
                / jnp.linalg.norm(b))

    out = {
        "metric": f"vcycle_ms_{BENCH_N}v",
        "value": round(tpu_ms, 4),
        "unit": "ms",
        "vs_baseline": round(meta["cpu_vcycle_ms"] / tpu_ms, 3),
    }
    print(json.dumps(out))
    print(f"# warm_full_build={build_s:.3f}s "
          f"cpu_vcycle={meta['cpu_vcycle_ms']:.2f}ms "
          f"(baseline measured at {meta['baseline_n']}v, scaled) "
          f"tpu_vcycle={tpu_ms:.4f}ms residual_after_{CYCLES + 1}={rel:.2e} "
          f"levels={[int(d.n_real) for d in diags]}", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Benchmark driver: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric (BASELINE.md): per-V-cycle wall time on a screened-
Poisson problem at GRAVOMG_BENCH_N vertices (default 500k; BASELINE
config-4 class), measured on the TPU with the fully device-resident
pipeline (grid kNN -> Laplacian -> hierarchy -> compaction -> V-cycles).

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
A separate subprocess measures the warm (compile-cached) hierarchy
build the same way.  Slope linearity is cross-checked with a third
cycle count (see `slope_r2` in the stderr report).

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
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")
RESULTS = os.path.join(REPO, "RESULTS.json")

# Wall-clock budget for the whole bench (driver end-of-round runs have
# a hard external timeout; round 3's BENCH_r03.json was rc=124/null
# because a cold-cache run blew straight through it).  Every subprocess
# gets the REMAINING budget as its timeout; on expiry/failure we fall
# back to the last committed RESULTS.json with "stale": true instead of
# dying without a parseable line.
BUDGET_S = float(os.environ.get("GRAVOMG_BENCH_BUDGET_S", "3300"))
_T0 = time.monotonic()


def _remaining() -> float:
    return max(30.0, BUDGET_S - (time.monotonic() - _T0))


def _xla_cache_entries() -> int:
    """Persistent-XLA-cache entry count -- recorded in the artifact so
    every timed number states the cache condition it was measured under
    (VERDICT r4 weak #5: 6x run-to-run cold-build variance is not
    evidence unless the cache state is known)."""
    try:
        return len(os.listdir(os.path.join(CACHE, "xla")))
    except OSError:
        return 0


def _default_n() -> str:
    # Prefer the 1M north-star headline (BASELINE.md) once its TPU
    # slope artifact exists (the measure queue produces it), or when a
    # committed RESULTS.json records a verified 1M measurement; fall
    # back to the 200k config otherwise.  GRAVOMG_BENCH_N overrides.
    if os.path.exists(os.path.join(CACHE,
                                   "tpu_slope_v3_1000000_2_12_32.json")):
        return "1000000"
    if os.path.exists(RESULTS):
        try:
            n = json.load(open(RESULTS)).get("bench_n")
            if n:
                return str(n)
        except Exception:  # noqa: BLE001
            pass
    return "200000"


BENCH_N = int(os.environ.get("GRAVOMG_BENCH_N", _default_n()))
N1 = int(os.environ.get("GRAVOMG_BENCH_C1", "2"))
N2 = int(os.environ.get("GRAVOMG_BENCH_C2", "12"))
N3 = int(os.environ.get("GRAVOMG_BENCH_C3", "32"))

_COMMON = r"""
import json, sys, time, gc, functools
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[-2])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import gravomg_tpu as g
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.hierarchy_static import (build_hierarchy_device,
                                          check_diagnostics,
                                          compact_solver)

def build_pipeline(n, escalate=0):
    # Morton-order the cloud host-side: a pure relabeling that gives
    # every level the spatial index locality the gather-free banded
    # operators need (ops/banded.py).
    pts = torus_points(n, seed=1).astype(np.float32)
    pts = pts[morton_order(pts)]
    cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
    graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
    # alpha="auto": invdist diagonals grow ~1/h while mass shrinks ~h^2,
    # so a fixed alpha's screening term falls below f32 resolution at
    # scale (measured 1e-10 relative at 1M) -- the stored operator
    # degenerates to a singular Laplacian + rounding noise and V-cycles
    # stall.  Auto pins the shift at 1e-4 of the mean diagonal
    # (apps/poisson.py), keeping every Galerkin level SPD in f32.
    spd, _ = g.screened_poisson_operator(graph, alpha="auto")
    # escalate > 0: widen every static cap (the same retry discipline as
    # scripts/bench_configs.py) -- a mesh the default plan undershoots
    # costs a rebuild, never the round's artifact (BENCH_r04 died on a
    # rap_cap overflow with no retry).
    kw = {}
    if escalate:
        from gravomg_tpu.config import DEFAULT_CAPS
        kw = dict(caps=DEFAULT_CAPS.escalated(escalate))
    h, diags = build_hierarchy_device(graph, spd, cfg, **kw)
    return cfg, graph, spd, h, diags, short
"""

_TPU_SCRIPT = _COMMON + r"""
n, n1, n2, n3 = (int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
                 int(sys.argv[4]))
out = sys.argv[-1]
t0 = time.perf_counter()
cfg, graph, spd, h, diags, short = build_pipeline(n)
# This D2H probe is the only reliable completion barrier (block_until_
# ready does not track true completion on this runtime).  It includes
# async remote-compile time on cold caches; t_build is therefore an
# upper bound, honest only on warm caches (see the warm-build probe).
probe = float(jnp.sum(h.solver.levels[-1].op.diag))
t_build = time.perf_counter() - t0

# Compaction syncs the level diagnostics (the process is now in the
# degraded ~48ms-per-launch dispatch mode either way) and slices every
# level to tight row/degree buckets -- the padded plan carries up to
# ~3x phantom rows otherwise.
assert not bool(short), "grid kNN shortfall"
escalate = 0
while True:
    try:
        check_diagnostics(diags)
        break
    except RuntimeError as e:
        escalate += 1
        if escalate > 2:
            raise
        # Cap overflow: rebuild with widened caps instead of losing the
        # round's headline (BENCH_r04 regression).  t_build then times
        # the escalated build -- honest, and the artifact records it.
        print(f"# caps escalation {escalate}: {e}", file=sys.stderr)
        h = diags = None
        gc.collect()
        t0 = time.perf_counter()
        cfg, graph, spd, h, diags, short = build_pipeline(n, escalate)
        probe = float(jnp.sum(h.solver.levels[-1].op.diag))
        t_build = time.perf_counter() - t0
sol = compact_solver(h.solver, diags)
# Fast operator forms: bucketed variable-window (slab) Pallas kernels
# on the large levels (pay only for the windows each row block needs;
# level-0 M drops ~1.1GB -> ~0.36GB at 200k), uniform block-dense on
# the small ones.  Exact: same products, different add order.
sol = g.attach_slab_operators(sol)
sol = g.attach_fast_operators(sol)
# Drop the uncompacted build hierarchy: its padded per-level arrays pin
# several GB of HBM at 1M vertices and nothing below reads them.
h = None
gc.collect()
b = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)

# All cycle measurements are SINGLE-launch programs (fori_loop inside
# one jit), so the constant per-launch cost cancels in the slope and
# the difference isolates true per-cycle execution.
@functools.partial(jax.jit, static_argnames=("cycles",))
def run_cycles(hs, b, cycles):
    def body(_, x):
        return g.v_cycle(hs, x, b, cfg)
    return jax.lax.fori_loop(0, cycles, body, jnp.zeros_like(b))

def timed(fn, arg, reps=5):
    x = fn(arg)                              # compile + first exec
    float(jnp.sum(x[:4]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        x = fn(arg)
        float(jnp.sum(x[:4]))                # completion barrier
        best = min(best, time.perf_counter() - t0)
    return best, x

t1, _ = timed(lambda c: run_cycles(sol, b, c), n1)
t2, x = timed(lambda c: run_cycles(sol, b, c), n2)
t3, _ = timed(lambda c: run_cycles(sol, b, c), n3)

# Slope + linearity check over the three counts.
xs = np.array([n1, n2, n3], float); ys = np.array([t1, t2, t3])
slope, icept = np.polyfit(xs, ys, 1)
pred = slope * xs + icept
ss_res = float(((ys - pred) ** 2).sum())
ss_tot = float(((ys - ys.mean()) ** 2).sum())
r2 = 1.0 - ss_res / max(ss_tot, 1e-30)

rel = float(jnp.linalg.norm(b - g.spmv(sol.levels[0].op, x))
            / jnp.linalg.norm(b))

# MG-PCG: per-iteration slope + iterations to the BASELINE 1e-8 target.
from gravomg_tpu.solve.spmv import spmv

@functools.partial(jax.jit, static_argnames=("iters",))
def run_pcg_iters(hs, b, iters):
    op = hs.levels[0].op
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = g.v_cycle(hs, jnp.zeros_like(r0), r0, cfg, x0_zero=True)
    def body(_, st):
        x, r, z, p, rz = st
        ap = g.level_matvec(hs.levels[0], p)
        alpha = rz / jnp.maximum(jnp.vdot(p, ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        z = g.v_cycle(hs, jnp.zeros_like(r), r, cfg, x0_zero=True)
        rz2 = jnp.vdot(r, z)
        return x, r, z, z + (rz2 / jnp.maximum(rz, 1e-30)) * p, rz2
    st = jax.lax.fori_loop(0, iters, body,
                           (x0, r0, z0, z0, jnp.vdot(r0, z0)))
    return st[0]

p1, _ = timed(lambda c: run_pcg_iters(sol, b, c), n1)
p2, xp = timed(lambda c: run_pcg_iters(sol, b, c), n2)
pcg_it_s = (p2 - p1) / (n2 - n1)
# Iteration count to 1e-8 (run once; while_loop with residual exit).
xs_, rel_pcg, iters_pcg = g.mg_pcg(sol, b, cfg)
iters_pcg = int(iters_pcg)
rel_pcg = float(rel_pcg)
time_to_1e8 = pcg_it_s * iters_pcg

# bf16 V-cycle preconditioner around the f32 FLEXIBLE CG (halves the
# dominant window-matrix streaming; the Polak-Ribiere beta absorbs the
# bf16 rounding that diverged fixed-beta PCG in round 2; CG's matvec
# and residuals stay f32).
sol16 = g.cast_fast_operators(sol, jnp.bfloat16)

@functools.partial(jax.jit, static_argnames=("iters",))
def run_fcg16(h16, hs, b, iters):
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = g.v_cycle(h16, jnp.zeros_like(r0), r0, cfg,
                   x0_zero=True).astype(b.dtype)
    def body(_, st):
        x, r, z, p, rz = st
        ap = g.level_matvec(hs.levels[0], p)
        alpha = rz / jnp.maximum(jnp.vdot(p, ap), 1e-30)
        x = x + alpha * p
        r_new = r - alpha * ap
        z = g.v_cycle(h16, jnp.zeros_like(r_new), r_new, cfg,
                      x0_zero=True).astype(b.dtype)
        rz2 = jnp.vdot(r_new, z)
        beta = (rz2 - jnp.vdot(r, z)) / jnp.maximum(rz, 1e-30)
        return x, r_new, z, z + beta * p, rz2
    st = jax.lax.fori_loop(0, iters, body,
                           (x0, r0, z0, z0, jnp.vdot(r0, z0)))
    return st[0]

q1, _ = timed(lambda c: run_fcg16(sol16, sol, b, c), n1)
q2, _ = timed(lambda c: run_fcg16(sol16, sol, b, c), n2)
pcg16_it_s = (q2 - q1) / (n2 - n1)
_, rel16, iters16 = g.mg_fcg(sol16, b, cfg, h_outer=sol)
time_to_1e8_bf16 = pcg16_it_s * int(iters16)

json.dump({"t_build": t_build, "escalate": escalate,
           "t1": t1, "t2": t2, "t3": t3,
           "n1": n1, "n2": n2, "n3": n3, "slope_s": float(slope),
           "slope_r2": r2, "residual": rel,
           "pcg_iter_s": pcg_it_s, "pcg_iters": iters_pcg,
           "pcg_rel": rel_pcg, "time_to_1e8_s": time_to_1e8,
           "pcg16_iter_s": pcg16_it_s, "pcg16_iters": int(iters16),
           "pcg16_rel": float(rel16),
           "time_to_1e8_bf16_s": time_to_1e8_bf16,
           "levels": [int(d.n_real) for d in diags],
           "shapes": [(l.op.num_vertices, l.op.max_degree)
                      for l in sol.levels]}, open(out, "w"))

# Export the compacted solver so the CPU baseline runs its SciPy
# V-cycles on the IDENTICAL hierarchy without re-running the (JAX-CPU,
# ~hours at 1M on one core) device-build pipeline.  save_solver only
# records op/u/cheb -- the attached fast forms are derived data.
from gravomg_tpu.io.serialization import save_solver
save_solver(sys.argv[5], sol)
"""

# Warm build: run the whole pipeline twice in one process and time the
# SECOND pass -- every shape is then compile-cached in-process, so the
# number is the true warm pipeline-and-build latency regardless of the
# persistent cache's state.  (Relying on the main script to pre-warm
# the persistent cache broke whenever the slope artifact was already
# cached: the "warm" subprocess then measured a cold compile storm,
# 875 s at 1M.)
_WARM_BUILD_SCRIPT = _COMMON + r"""
n, esc, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[-1]
cfg, graph, spd, h, diags, short = build_pipeline(n, esc)
probe = float(jnp.sum(h.solver.levels[-1].op.diag))
# Free the first build BEFORE the second: a tuple rebind drops the old
# hierarchy only after the second build returns, so both would be
# resident together -- 2x HBM, ResourceExhausted at 1M (measured r4).
h = diags = None
gc.collect()
t0 = time.perf_counter()
cfg, graph, spd, h, diags, short = build_pipeline(n, esc)
probe = float(jnp.sum(h.solver.levels[-1].op.diag))
t_build = time.perf_counter() - t0
json.dump({"t_build_warm": t_build}, open(out, "w"))
"""

# Execution-only build timing (VERDICT r2 task 3): the warm-build wall
# time is contaminated by remote-compile-service variance (30-700 s per
# stage observed), so it cannot attribute cost to device work.  This
# script runs the full pipeline once (compiling everything in-process),
# then executes the device-resident build R more times on the same
# inputs and ends with ONE probe; two subprocesses with different R give
# the true per-build execution slope with launch/compile/probe constants
# cancelled (same protocol as the V-cycle slope).
_BUILD_EXEC_SCRIPT = _COMMON + r"""
n, reps, esc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
out = sys.argv[-1]
kw = {}
if esc:
    kw = dict(rap_cap=64 * 2 ** esc, kc_cap=48 + 16 * esc,
              assoc_factor=2 * 2 ** esc, tri_factor=2 * 2 ** esc,
              rap_y_width=24 * 2 ** esc)
t0 = time.perf_counter()
cfg, graph, spd, h, diags, short = build_pipeline(n, esc)
for _ in range(reps):
    # Free the previous hierarchy BEFORE rebuilding: a tuple rebind
    # keeps it alive through the new build (2x HBM, OOM at 1M).
    h = diags = None
    gc.collect()
    h, diags = build_hierarchy_device(graph, spd, cfg, **kw)
probe = float(jnp.sum(h.solver.levels[-1].op.diag))
json.dump({"t_total": time.perf_counter() - t0, "reps": reps},
          open(out, "w"))
"""

# Sequential CPU hierarchy build (csrc reference-semantics pipeline,
# C4->C12 per level) at the same N: the build-time baseline the
# execution-only number races (BASELINE "hierarchy construction" target).
_BUILD_CPU_SCRIPT = r"""
import json, sys, time
import numpy as np
import gravomg_tpu.io.native as native
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync

n, out = int(sys.argv[1]), sys.argv[2]
pts = torus_points(n, seed=1).astype(np.float32)
pts = pts[morton_order(pts)]
graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
assert not bool(short)
nbr = np.asarray(graph.neighbors)
dst = np.asarray(graph.distances)
p64 = np.asarray(pts, np.float64)
t0 = time.perf_counter()
native.build_hierarchy(nbr, dst, p64, reduction_ratio=2.0)
json.dump({"cpu_build_s": time.perf_counter() - t0}, open(out, "w"))
"""

_BASELINE_SCRIPT = r"""
import json, os, sys, time
import numpy as np
import jax.numpy as jnp
import gravomg_tpu as g
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.hierarchy_static import (build_hierarchy_device,
                                          check_diagnostics,
                                          compact_solver)
import scipy.sparse as sp
import scipy.linalg as sla

n, out_json = int(sys.argv[1]), sys.argv[2]
solver_npz = sys.argv[3] if len(sys.argv) > 3 else ""
cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")

def _ell_to_csr(nbr, off, diag):
    v_, k_ = nbr.shape
    mask = nbr != int(g.INVALID_INDEX)
    rows = np.repeat(np.arange(v_), k_)[mask.ravel()]
    cols = nbr.ravel()[mask.ravel()]
    m = sp.csr_matrix((off.ravel()[mask.ravel()], (rows, cols)),
                      shape=(v_, v_))
    return m + sp.diags(diag)

def _u_to_csr(ucols, uw, n_coarse):
    vf = ucols.shape[0]
    rows = np.repeat(np.arange(vf), 3)
    return sp.csr_matrix((uw.ravel(), (rows, ucols.ravel())),
                         shape=(vf, n_coarse))

if solver_npz and os.path.exists(solver_npz):
    # The TPU bench run exported its compacted solver: run the SciPy
    # V-cycle on the IDENTICAL hierarchy (same levels, same nnz, same
    # Chebyshev windows).  Avoids re-running the whole device-build
    # pipeline on CPU JAX, which takes hours at 1M on one core.
    nb = n
    z = np.load(solver_npz)
    nlev = int(z["n_levels"])
    As = [_ell_to_csr(z[f"l{i}_nbr"], z[f"l{i}_off"],
                      np.asarray(z[f"l{i}_diag"], np.float64))
          for i in range(nlev)]
    Us = [_u_to_csr(z[f"l{i}_ucols"], z[f"l{i}_uw"],
                    int(z[f"l{i}_unc"])) for i in range(nlev - 1)]
    cheb = [tuple(map(float, z[f"l{i}_cheb"]))
            for i in range(nlev - 1)]
else:
    # MEASURED at full size (VERDICT r2 Weak #5: no linear
    # extrapolation; an explicit cap env remains for smoke runs only).
    nb = min(n, int(os.environ.get("GRAVOMG_BENCH_CPU_CAP", str(n))))
    pts = torus_points(nb, seed=1).astype(np.float32)
    pts = pts[morton_order(pts)]
    graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
    assert not bool(short)
    # Same auto-scaled screening as the TPU script (see build_pipeline).
    spd, _ = g.screened_poisson_operator(graph, alpha="auto")
    h, diags = build_hierarchy_device(graph, spd, cfg)
    check_diagnostics(diags)
    hs = compact_solver(h.solver, diags)
    As = [_ell_to_csr(np.asarray(l.op.neighbors), np.asarray(l.op.offdiag),
                      np.asarray(l.op.diag)) for l in hs.levels]
    Us = [_u_to_csr(np.asarray(l.u.cols), np.asarray(l.u.weights),
                    l.u.n_coarse) for l in hs.levels[:-1]]
    cheb = [(float(l.cheb.lam_min), float(l.cheb.lam_max))
            for l in hs.levels[:-1]]

Dinv = [1.0 / A.diagonal() for A in As]
# Deep f32 RAP chains leave the coarsest operator slightly asymmetric
# and indefinite in the last digits at 1M scale; symmetrize in f64 and
# escalate the shift until SPD (mirrors solve/coarse.py).
_ac = As[-1].toarray().astype(np.float64)
_ac = 0.5 * (_ac + _ac.T)
_base = np.abs(np.diag(_ac)).max()
for _s in (1e-10, 1e-6, 1e-4):
    try:
        chol = sla.cho_factor(_ac + _s * _base * np.eye(_ac.shape[0]))
        break
    except np.linalg.LinAlgError:
        continue
else:
    raise RuntimeError("coarsest operator not factorizable")

# Same smoother as the TPU path (Chebyshev of cfg.chebyshev_degree on
# the Jacobi-preconditioned operator) so per-cycle work matches.
def smooth(lvl, x, b):
    A, dinv = As[lvl], Dinv[lvl]
    lo, hi = cheb[lvl]
    theta, delta = 0.5 * (hi + lo), 0.5 * (hi - lo)
    sigma = theta / delta
    rho = 1.0 / sigma
    r = dinv * (b - A @ x)
    d = r / theta
    x = x + d
    for _ in range(cfg.chebyshev_degree - 1):
        r = dinv * (b - A @ x)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * r
        x = x + d
        rho = rho_new
    return x

def vcycle_cpu(lvl, x, b):
    if lvl == len(As) - 1:
        return sla.cho_solve(chol, b)
    A, U = As[lvl], Us[lvl]
    x = smooth(lvl, x, b)
    r = b - A @ x
    e = vcycle_cpu(lvl + 1, np.zeros(U.shape[1]), U.T @ r)
    x = x + U @ e
    return smooth(lvl, x, b)

b = np.random.default_rng(0).standard_normal(nb)
x = vcycle_cpu(0, np.zeros(nb), b)
t0 = time.perf_counter()
for _ in range(20):
    x = vcycle_cpu(0, x, b)
cpu_ms = (time.perf_counter() - t0) / 20 * 1000 * (n / nb)
json.dump({"cpu_vcycle_ms": cpu_ms, "baseline_n": nb}, open(out_json, "w"))
"""


def solver_npz_path(n: int) -> str:
    return os.path.join(CACHE, f"solver_v3_{n}.npz")


def run_tpu(n: int, n1: int, n2: int, n3: int) -> dict:
    os.makedirs(CACHE, exist_ok=True)
    out = os.path.join(CACHE, f"tpu_slope_v3_{n}_{n1}_{n2}_{n3}.json")
    if not os.path.exists(out):
        subprocess.run(
            [sys.executable, "-c", _TPU_SCRIPT, str(n), str(n1), str(n2),
             str(n3), solver_npz_path(n), os.path.join(CACHE, "xla"),
             out], check=True, cwd=REPO, timeout=_remaining())
    return json.load(open(out))


def run_warm_build(n: int, esc: int = 0) -> dict:
    os.makedirs(CACHE, exist_ok=True)
    sfx = f"_e{esc}" if esc else ""
    out = os.path.join(CACHE, f"tpu_warmbuild_{n}{sfx}.json")
    if not os.path.exists(out):
        subprocess.run(
            [sys.executable, "-c", _WARM_BUILD_SCRIPT, str(n), str(esc),
             os.path.join(CACHE, "xla"), out], check=True, cwd=REPO,
            timeout=_remaining())
    return json.load(open(out))


def run_build_exec(n: int, r1: int = 0, r2: int = 4,
                   esc: int = 0) -> dict:
    os.makedirs(CACHE, exist_ok=True)
    sfx = f"_e{esc}" if esc else ""
    ts = {}
    for reps in (r1, r2):
        out = os.path.join(CACHE, f"tpu_buildexec_{n}_{reps}{sfx}.json")
        if not os.path.exists(out):
            subprocess.run(
                [sys.executable, "-c", _BUILD_EXEC_SCRIPT, str(n),
                 str(reps), str(esc), os.path.join(CACHE, "xla"), out],
                check=True, cwd=REPO, timeout=_remaining())
        ts[reps] = json.load(open(out))["t_total"]
    return {"build_exec_s": (ts[r2] - ts[r1]) / (r2 - r1),
            "t_r1": ts[r1], "t_r2": ts[r2]}


def cpu_build_baseline(n: int) -> dict:
    os.makedirs(CACHE, exist_ok=True)
    meta = os.path.join(CACHE, f"cpubuild_{n}.json")
    if not os.path.exists(meta):
        env = dict(os.environ)
        env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": "",
                    "JAX_ENABLE_X64": "0"})
        subprocess.run([sys.executable, "-c", _BUILD_CPU_SCRIPT, str(n),
                        meta], check=True, env=env, cwd=REPO,
                       timeout=_remaining())
    return json.load(open(meta))


def cpu_baseline(n: int) -> dict:
    os.makedirs(CACHE, exist_ok=True)
    meta = os.path.join(CACHE, f"baseline_v3_{n}.json")
    if not os.path.exists(meta):
        env = dict(os.environ)
        env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": "",
                    "JAX_ENABLE_X64": "0"})
        subprocess.run([sys.executable, "-c", _BASELINE_SCRIPT, str(n),
                        meta, solver_npz_path(n)], check=True, env=env,
                       cwd=REPO, timeout=_remaining())
    return json.load(open(meta))


def _fallback(reason: str) -> None:
    """Print the last committed verified result, marked stale.

    The driver records whatever single JSON line this process prints;
    a missing line (rc!=0 / timeout) loses the whole round's evidence
    (BENCH_r03.json).  A stale-but-verified committed number with
    provenance beats silence.
    """
    if not os.path.exists(RESULTS):
        print(json.dumps({"metric": "bench_failed", "value": 0.0,
                          "unit": "none", "vs_baseline": 0.0,
                          "stale": True, "reason": reason}))
        return
    rec = json.load(open(RESULTS))
    out = {"metric": rec["metric"], "value": rec["value"],
           "unit": rec["unit"], "vs_baseline": rec["vs_baseline"],
           "stale": True, "reason": reason,
           "measured_at": rec.get("measured_at", "unknown")}
    print(json.dumps(out))
    print(f"# stale fallback ({reason}); committed record: "
          f"{json.dumps(rec.get('detail', {}))[:600]}", file=sys.stderr)


def main():
    # TPU first: it exports its compacted solver, which the CPU baseline
    # then reuses (identical hierarchy, no hours-long CPU JAX rebuild).
    cache0 = _xla_cache_entries()
    try:
        r = run_tpu(BENCH_N, N1, N2, N3)
        meta = cpu_baseline(BENCH_N)
    except subprocess.TimeoutExpired:
        _fallback(f"budget {BUDGET_S:.0f}s exceeded on cold caches")
        return
    except subprocess.CalledProcessError as e:
        _fallback(f"measurement subprocess failed rc={e.returncode}")
        return
    # The auxiliary build timings must not take the headline down with
    # them: a dead TPU tunnel (or a watchdog fault in one probe) still
    # leaves a valid cached slope artifact to report.
    esc = int(r.get("escalate", 0))
    try:
        warm = run_warm_build(BENCH_N, esc)
    except Exception as e:  # noqa: BLE001
        print(f"# warm-build probe failed: {type(e).__name__}",
              file=sys.stderr)
        warm = {"t_build_warm": float("nan")}
    try:
        bexec = run_build_exec(BENCH_N, esc=esc)
    except Exception as e:  # noqa: BLE001
        print(f"# build-exec probe failed: {type(e).__name__}",
              file=sys.stderr)
        bexec = {"build_exec_s": float("nan")}
    try:
        bcpu = cpu_build_baseline(BENCH_N)
    except Exception as e:  # noqa: BLE001
        print(f"# cpu-build probe failed: {type(e).__name__}",
              file=sys.stderr)
        bcpu = {"cpu_build_s": float("nan")}
    tpu_ms = max(r["slope_s"] * 1000, 1e-4)
    # The default solve path (solve/cg.py::mg_solve): bf16-FCG above
    # the config threshold, f32 MG-PCG below -- report its
    # time-to-target as the solver headline alongside the V-cycle slope.
    if BENCH_N >= 500_000 and r.get("pcg16_rel", 1.0) <= 1e-8:
        t_default = r.get("time_to_1e8_bf16_s", r["time_to_1e8_s"])
        default_path = "bf16_fcg"
    else:
        t_default = r["time_to_1e8_s"]
        default_path = "f32_pcg"
    out = {
        "metric": f"vcycle_ms_{BENCH_N}v",
        "value": round(tpu_ms, 4),
        "unit": "ms",
        "vs_baseline": round(meta["cpu_vcycle_ms"] / tpu_ms, 3),
    }
    print(json.dumps(out))
    # Persist the verified record for the stale-fallback path and for
    # committing into git (VERDICT r3: measured numbers must survive in
    # a driver-verifiable committed artifact, not only in prose).
    try:
        rec = dict(out)
        rec.update({"bench_n": BENCH_N,
                    "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                 time.gmtime()),
                    "detail": {"slope": r, "cpu": meta, "warm": warm,
                               "build_exec": bexec, "cpu_build": bcpu,
                               "xla_cache": {
                                   "entries_at_start": cache0,
                                   "entries_at_end": _xla_cache_entries(),
                                   "cold_start": cache0 == 0}}})
        json.dump(rec, open(RESULTS, "w"), indent=1)
    except Exception as e:  # noqa: BLE001
        print(f"# RESULTS.json write failed: {type(e).__name__}",
              file=sys.stderr)
    scaled = ("" if meta["baseline_n"] == BENCH_N
              else f"(cpu measured at {meta['baseline_n']}v, scaled) ")
    print(f"# build_cold_upper_bound={r['t_build']:.3f}s "
          f"build_warm={warm['t_build_warm']:.3f}s "
          f"build_exec={bexec['build_exec_s']:.3f}s "
          f"build_cpu_csrc={bcpu['cpu_build_s']:.3f}s "
          f"cpu_vcycle={meta['cpu_vcycle_ms']:.2f}ms {scaled}"
          f"tpu_vcycle={tpu_ms:.4f}ms slope_r2={r['slope_r2']:.6f} "
          f"T({r['n1']})={r['t1']:.3f}s T({r['n2']})={r['t2']:.3f}s "
          f"T({r['n3']})={r['t3']:.3f}s "
          f"residual_12cycles={r['residual']:.2e} "
          f"pcg_iter_ms={r['pcg_iter_s']*1000:.3f} "
          f"pcg_iters_to_1e8={r['pcg_iters']} pcg_rel={r['pcg_rel']:.2e} "
          f"time_to_1e8_s={r['time_to_1e8_s']:.4f} "
          f"default_path={default_path} "
          f"time_to_1e8_default_s={t_default:.4f} "
          f"bf16: pcg_iter_ms={r.get('pcg16_iter_s', 0)*1000:.3f} "
          f"iters={r.get('pcg16_iters', -1)} "
          f"rel={r.get('pcg16_rel', -1):.2e} "
          f"t1e8={r.get('time_to_1e8_bf16_s', -1):.4f} "
          f"levels={r['levels']} shapes={r['shapes']}", file=sys.stderr)


if __name__ == "__main__":
    main()

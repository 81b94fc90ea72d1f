"""Attribute and attack the 1M Galerkin RAP cost (60 s of the 72 s build).

Loads the REAL exported 1M hierarchy (level-0 operator (1M, 32) + U)
and times, at the builder's padded shapes (nc cap 423808, degree 128,
y_width 24):

  A. galerkin_rap_2phase as shipped (now: chunked phase 1 + ONE global
     cosorted sort-scatter phase 2)
  B. phase 1 alone (5x _au_rows)   -- the lane-merged Y
  B2. ONE chunk of the legacy per-chunk accumulator merge (x5 in the
     pre-rework path; measured 11.0 s each at 1M)
  C2. the global phase 2 alone

Historical numbers (pre-rework, this file's first run): A=60.0 s,
B=3.5 s, B2=11.0 s, C(=phase1+global pre-cosort)=11.6 s.
Usage: python scripts/profile_rap1m.py [reps=2]
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

from gravomg_tpu.types import EllOperator, Prolongation, INVALID_INDEX
from gravomg_tpu.solve.rap2 import (galerkin_rap_2phase, _au_rows,
                                    _rap2_chunk_merge)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
NC_CAP = 423808          # plan_levels(1M) level-0 cap, the builder shape
MAX_DEGREE = 128
Y_WIDTH = 24
CHUNK = 200_000


def probe(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(jnp.ravel(leaves[0])[:4].astype(jnp.float32)))


def timed(name, fn, reps=REPS):
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


def main():
    z = np.load(os.path.join(os.path.dirname(__file__), "..",
                             ".bench_cache", "solver_v3_1000000.npz"))
    op = EllOperator(neighbors=jnp.asarray(z["l0_nbr"]),
                     offdiag=jnp.asarray(z["l0_off"]),
                     diag=jnp.asarray(z["l0_diag"]))
    u = Prolongation(cols=jnp.asarray(z["l0_ucols"]),
                     weights=jnp.asarray(z["l0_uw"]), n_coarse=NC_CAP)
    vf = op.num_vertices
    print(f"vf={vf} K={op.neighbors.shape[1]} nc_cap={NC_CAP} "
          f"deg={MAX_DEGREE} yw={Y_WIDTH}", flush=True)

    # --- A: current path -------------------------------------------------
    a_out = timed("A current 2phase (chunked)",
                  lambda: galerkin_rap_2phase(op, u, MAX_DEGREE,
                                              y_width=Y_WIDTH,
                                              chunk_rows=CHUNK))

    # --- B: phase 1 alone -------------------------------------------------
    n_chunks = -(-vf // CHUNK)

    def phase1():
        ycs, yvs = [], []
        for c0 in range(n_chunks):
            s = slice(c0 * CHUNK, (c0 + 1) * CHUNK)
            yc, yv, _ = _au_rows(op.neighbors[s], op.offdiag[s],
                                 op.diag[s], u.cols[s], u.weights[s],
                                 u.cols, u.weights, Y_WIDTH)
            ycs.append(yc)
            yvs.append(yv)
        return jnp.concatenate(ycs), jnp.concatenate(yvs)

    y_cols, y_vals = timed("B phase1 only (5x _au_rows)", phase1)

    # --- B2: one chunk's phase-2 merge (scales x5 in A) -------------------
    acc_cols = jnp.full((NC_CAP, MAX_DEGREE + 1), INVALID_INDEX, jnp.int32)
    acc_vals = jnp.zeros((NC_CAP, MAX_DEGREE + 1), jnp.float32)
    s = slice(0, CHUNK)
    timed("B2 one chunk _rap2_chunk_merge",
          lambda: _rap2_chunk_merge(acc_cols, acc_vals, jnp.bool_(False),
                                    u.cols[s], u.weights[s],
                                    y_cols[s], y_vals[s], MAX_DEGREE))

    # --- C2: global phase 2 alone (the new default's second half) --------
    from gravomg_tpu.solve.rap2 import _uty_global

    timed("C2 _uty_global alone",
          lambda: _uty_global(u.cols, u.weights, y_cols, y_vals,
                              NC_CAP, MAX_DEGREE))

    # --- exactness: new default vs legacy per-chunk accumulation ---------
    from gravomg_tpu.solve.rap import _rap_finalize
    from gravomg_tpu.solve.spmv import spmv

    def legacy():
        acc_c = jnp.full((NC_CAP, MAX_DEGREE + 1), INVALID_INDEX,
                         jnp.int32)
        acc_v = jnp.zeros((NC_CAP, MAX_DEGREE + 1), jnp.float32)
        ov = jnp.bool_(False)
        for c0 in range(n_chunks):
            s = slice(c0 * CHUNK, (c0 + 1) * CHUNK)
            acc_c, acc_v, ov = _rap2_chunk_merge(
                acc_c, acc_v, ov, u.cols[s], u.weights[s],
                y_cols[s], y_vals[s], MAX_DEGREE)
        return _rap_finalize(acc_c, acc_v, MAX_DEGREE), ov

    l_op, _ = legacy()
    a_op = a_out[0]
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(NC_CAP).astype(np.float32))
    ya = spmv(a_op, x)
    yl = spmv(l_op, x)
    den = float(jnp.max(jnp.abs(yl))) or 1.0
    err = float(jnp.max(jnp.abs(ya - yl))) / den
    print(f"default vs legacy matvec rel-max err: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()

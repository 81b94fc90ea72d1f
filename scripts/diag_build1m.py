"""Diagnose the r4 end-of-round 1M default-build failure.

Builds the bench pipeline hierarchy at N (default 1M) with the CURRENT
defaults, prints every per-level diagnostic flag, then pulls each
level's (A, U) to host and computes the exact structural requirements:

  * y_req: max over fine rows of distinct coarse columns in row(A U)
    -- what rap_y_width must cover at that level,
  * rap_deg: true max off-diagonal degree of U^T A U (scipy product)
    -- what rap_cap_for_level must cover,
  * op_deg: observed max degree of the stored operator.

Usage:  python scripts/diag_build1m.py [N]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".bench_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import gravomg_tpu as g
from gravomg_tpu.geometry.gridknn import grid_knn_graph_nosync
from gravomg_tpu.geometry.meshes import torus_points
from gravomg_tpu.geometry.order import morton_order
from gravomg_tpu.hierarchy_static import (build_hierarchy_device,
                                          plan_levels, rap_cap_for_level)
from gravomg_tpu.types import INVALID_INDEX

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

pts = torus_points(N, seed=1).astype(np.float32)
pts = pts[morton_order(pts)]
cfg = g.MultigridConfig(coarse_threshold=1000, smoother="chebyshev")
graph, short = grid_knn_graph_nosync(pts, 16, margin=2.4)
spd, _ = g.screened_poisson_operator(graph, alpha="auto")
t0 = time.perf_counter()
h, diags = build_hierarchy_device(graph, spd, cfg)
probe = float(jnp.sum(h.solver.levels[-1].op.diag))
print(f"# build wall {time.perf_counter() - t0:.1f}s probe={probe:.3e}",
      flush=True)

caps = plan_levels(graph.num_vertices, cfg)
print(f"# caps: {caps}", flush=True)

report = {"n": N, "caps": caps, "levels": []}
for i, d in enumerate(diags):
    rec = {
        "level": i, "cap": caps[i],
        "n_real": int(d.n_real),
        "cap_overflow": bool(d.cap_overflow),
        "edge_overflow": bool(d.edge_overflow),
        "tri_overflow": bool(d.tri_overflow),
        "rap_overflow": bool(d.rap_overflow),
        "sampling_undecided": bool(d.sampling_undecided),
        "rt_overflow": bool(d.rt_overflow),
        "bd_overflow": bool(d.bd_overflow),
        "point_fallbacks": int(d.point_fallbacks),
    }
    report["levels"].append(rec)
    print("#", json.dumps(rec), flush=True)

# Host-side structural requirements per level transition.
import scipy.sparse as sp

for i, lvl in enumerate(h.solver.levels[:-1]):
    op = lvl.op
    u = lvl.u
    nbr = np.asarray(op.neighbors)
    off = np.asarray(op.offdiag)
    dia = np.asarray(op.diag)
    ucols = np.asarray(u.cols)
    uw = np.asarray(u.weights)
    vf, k = nbr.shape
    nc = u.n_coarse

    mask = nbr != int(INVALID_INDEX)
    rows = np.repeat(np.arange(vf), k)[mask.ravel()]
    cols = nbr.ravel()[mask.ravel()]
    A = sp.csr_matrix((off.ravel()[mask.ravel()], (rows, cols)),
                      shape=(vf, vf)) + sp.diags(dia)
    # U as structural (ignore zero weights? keep structure of real rows
    # only: phantom rows have weight 0 AND col 0; count them separately)
    urows = np.repeat(np.arange(vf), ucols.shape[1])
    U = sp.csr_matrix((uw.ravel(), (urows, ucols.ravel())),
                      shape=(vf, nc))
    U.sum_duplicates()
    # structural U (nonzero weights only)
    Us = U.copy()
    Us.eliminate_zeros()
    AU = (A @ Us).tocsr()
    AU.eliminate_zeros()
    y_req = int(np.diff(AU.indptr).max()) if AU.nnz else 0
    y_req_999 = float(np.quantile(np.diff(AU.indptr), 0.999))
    RAP = (Us.T @ AU).tocsr()
    RAP.eliminate_zeros()
    deg = np.diff(RAP.indptr)
    rap_deg = int(deg.max()) if RAP.nnz else 0
    # off-diagonal degree (the ELL cap excludes the diagonal)
    rap_offdeg = rap_deg - 1
    op_deg = int(mask.sum(axis=1).max())
    r_cap_eff = rap_cap_for_level(caps[i], 64) if i < len(caps) else -1
    rec = {"transition": f"L{i}->L{i + 1}", "vf": vf, "nc": nc,
           "op_deg": op_deg, "y_req_max": y_req,
           "y_req_p999": y_req_999,
           "rap_offdeg_true": rap_offdeg,
           "r_cap_eff(rap64)": r_cap_eff,
           "y_w_used": (24 if vf > 65536 else
                        min(3 * (k + 1), max(24, 48)))}
    report["levels"][i].update(rec)
    print("#", json.dumps(rec), flush=True)

json.dump(report, open("scripts/diag_build1m_out.json", "w"), indent=1)
print("# wrote scripts/diag_build1m_out.json", flush=True)

"""Multi-device execution: batched (data-parallel) and vertex-sharded solves.

The reference is single-threaded CPU with no parallel code at all
(SURVEY.md §2.3); the TPU-native scaling axes for this domain are:

  * **data parallelism over meshes** -- vmapped V-cycles on a batch of
    same-bucket meshes, sharded over the device mesh's 'data' axis
    (BASELINE.json config 5: 64-mesh shape collections);
  * **vertex sharding** (the graph analogue of sequence/context
    parallelism, SURVEY.md §5) -- the ELL rows of A, and all vectors,
    sharded over the 'vertex' axis.  ELL SpMV gathers arbitrary remote
    rows, so the vector is all-gathered before the gather; XLA inserts
    the collective from the sharding annotations, and dot products in
    CG/V-cycle norms become psums automatically.

Both paths are plain jit-with-shardings: no hand-written collectives are
needed at this communication pattern's scale (an all-gather of a (V,)
vector per SpMV rides ICI at line rate).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gravomg_tpu.config import MultigridConfig
from gravomg_tpu.solve.vcycle import SolverHierarchy, v_cycle
from gravomg_tpu.solve.spmv import spmv


def make_mesh(n_devices: Optional[int] = None,
              axis: str = "data") -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devs), (axis,))


def pad_axis(x: jax.Array, mult: int, axis: int = 0,
             fill=0) -> jax.Array:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def pad_solver_fine_level(h: SolverHierarchy, mult: int) -> SolverHierarchy:
    """Pad the finest level to a vertex count divisible by ``mult`` so it
    can shard evenly.  Padded rows are decoupled identity rows (diag 1,
    no neighbors, zero prolongation weights): they solve to x=0 for b=0
    and perturb nothing."""
    from gravomg_tpu.types import INVALID_INDEX

    lvl = h.levels[0]
    v = lvl.op.num_vertices
    pad = (-v) % mult
    if pad == 0:
        return h
    op = lvl.op
    new_op = op._replace(
        neighbors=pad_axis(op.neighbors, mult, fill=INVALID_INDEX),
        offdiag=pad_axis(op.offdiag, mult, fill=0),
        diag=pad_axis(op.diag, mult, fill=1.0),
    )
    u = lvl.u
    new_u = None
    if u is not None:
        new_u = u._replace(cols=pad_axis(u.cols, mult, fill=0),
                           weights=pad_axis(u.weights, mult, fill=0.0))
    # The gather-form U^T table stays valid: padded fine rows have zero
    # weights, so they were never in the table; only the static fine
    # count needs refreshing.
    new_ut = (lvl.ut._replace(n_fine=v + pad)
              if lvl.ut is not None else None)
    new_lvl = lvl._replace(op=new_op, u=new_u, ut=new_ut)
    return h._replace(levels=(new_lvl,) + h.levels[1:])


def batched_vcycle(h: SolverHierarchy, cfg: MultigridConfig, mesh: Mesh,
                   axis: str = "data"):
    """Return a jitted function solving a sharded batch of RHS with one
    V-cycle each: (B, V) -> (B, V), B sharded over the mesh.

    One hierarchy, many right-hand sides -- the spectral / curvature-flow
    time-stepping pattern (BASELINE.json config 5); for distinct meshes
    per batch entry, stack hierarchies with identical padded shapes and
    vmap over them the same way.
    """
    batch_sharding = NamedSharding(mesh, P(axis, None))

    def step(xs, bs):
        xs = jax.lax.with_sharding_constraint(xs, batch_sharding)
        out = jax.vmap(lambda x, b: v_cycle(h, x, b, cfg))(xs, bs)
        return jax.lax.with_sharding_constraint(out, batch_sharding)

    return jax.jit(step)


def vertex_sharded_cg_step(h: SolverHierarchy, cfg: MultigridConfig,
                           mesh: Mesh, axis: str = "data"):
    """Return a jitted MG-preconditioned-CG step with the fine level's
    vectors sharded over vertices.

    The fine operator's ELL rows and all fine vectors carry a
    PartitionSpec((axis,)) sharding; gathers of x[neighbors] induce an
    all-gather of x, reductions induce psum -- all inserted by XLA from
    the annotations (scaling-book recipe: annotate, compile, let XLA
    place collectives on ICI).
    """
    vspec = NamedSharding(mesh, P(axis))
    a0 = h.levels[0].op

    def step(x, r, p, rz):
        x = jax.lax.with_sharding_constraint(x, vspec)
        p = jax.lax.with_sharding_constraint(p, vspec)
        ap = spmv(a0, p)
        alpha = rz / jnp.vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = v_cycle(h, jnp.zeros_like(r), r, cfg)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (jax.lax.with_sharding_constraint(x, vspec), r, p, rz_new)

    return jax.jit(step)

"""Pallas/Mosaic kernel for the block-window dense SpMV.

Same math as :func:`gravomg_tpu.ops.blockdense.blockdense_matvec`
(y = sum over window slots of M * gathered-window(x), see that module's
docstring) in a single fused kernel:

  * grid = (NBLK,): one program per row block;
  * the per-block window starts arrive via scalar prefetch
    (``PrefetchScalarGridSpec``), so each program can issue *dynamic
    slices* of x from VMEM -- the one indexed-access pattern Mosaic
    supports well.  This sidesteps the measured ~7 ns/index cost of XLA
    TPU gathers (PROGRESS.md) exactly the way the XLA formulation does,
    but with the gather, multiply, and lane-reduce fused into one pass
    over M: no materialized (NBLK, NWW) window tensor, no
    composition-dependent re-fusion decisions by XLA inside the
    V-cycle (the round-2 in-solver SpMV ran 8.5 ms vs 2.4 ms
    standalone; a pallas_call is scheduling-opaque).
  * M streams HBM->VMEM through the BlockSpec pipeline (double
    buffered by Mosaic); x is VMEM-resident for the whole call
    (4 MB at 1M vertices).

The escape chute and the diagonal term remain outside in XLA -- they
are tiny and fuse into the surrounding elementwise ops.

Reference context: this is the TPU execution form of the multigrid
operators whose *semantics* come from `/root/reference/src/multigrid.cpp`
(SpMV over the hierarchy's Galerkin operators); the reference has no
counterpart kernel (it is a sequential Eigen library).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gravomg_tpu.ops.blockdense import BlockDenseOperator


def _matvec_kernel(ws_ref, x_ref, m_ref, o_ref, *, nw: int, window: int,
                   window0: int, acc_dtype):
    """One row block: gather NW window slices of x, multiply into the
    dense window matrix, lane-reduce."""
    i = pl.program_id(0)
    xw0 = x_ref[0, pl.ds(ws_ref[i * nw], window0)]          # (W0,)
    parts = [xw0]
    for wi in range(1, nw):
        parts.append(x_ref[0, pl.ds(ws_ref[i * nw + wi], window)])
    xw = jnp.concatenate(parts, axis=0)                      # (NWW,)
    prod = m_ref[0].astype(acc_dtype) * xw[None, :].astype(acc_dtype)
    o_ref[0, :] = jnp.sum(prod, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def blockdense_matvec_pallas(op: BlockDenseOperator, x: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """Drop-in Pallas replacement for ``blockdense_matvec`` (1-D x).

    Bit-compatible reduction order with the XLA path is NOT guaranteed
    (both are float sums over the same NWW products); exactness tests
    compare against the plain ELL SpMV at matching tolerances.
    """
    nblk, blk, nww = op.m.shape
    nw = op.nw
    win, win0 = op.window, op.window0
    r = op.n_rows
    acc = jnp.promote_types(op.m.dtype, jnp.float32)

    xp = jnp.pad(x, (0, max(win, win0)))[None, :]            # (1, NCp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),           # x, whole
            pl.BlockSpec((1, blk, nww), lambda i, ws: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # M block
        ],
        out_specs=pl.BlockSpec((1, blk), lambda i, ws: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        functools.partial(_matvec_kernel, nw=nw, window=win,
                          window0=win0, acc_dtype=acc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk, blk), x.dtype),
        interpret=interpret,
    )(op.win_start.reshape(-1), xp, op.m)

    y = y.reshape(-1)[:r]
    if op.esc_w.shape[0]:
        contrib = op.esc_w * x[jnp.minimum(op.esc_cols, op.n_cols - 1)]
        y = y + jax.ops.segment_sum(
            contrib.astype(x.dtype), jnp.minimum(op.esc_rows, r),
            num_segments=r + 1, indices_are_sorted=True)[:r]
    if op.diag is not None:
        y = y + op.diag * x
    return y

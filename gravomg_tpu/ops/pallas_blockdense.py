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


def pick_group(nblk: int, bytes_per_block: int,
               budget_bytes: int) -> int:
    """Rows-blocks per grid step for a BLOCKED (group, ...) out spec.

    Mosaic requires the out block's second-minor dim (``group``) to be
    divisible by 8 OR equal to the whole-array dim (``nblk``) -- the
    constraint that faulted the first 1M run when the out spec was
    unblocked.  Prefer the largest multiple of 8 dividing nblk whose M
    slab stays under ``budget_bytes`` (amortizes the measured ~0.5 us
    per-grid-step cost); fall back to the whole array.
    """
    budget = max(8, budget_bytes // max(bytes_per_block, 1))
    group = nblk
    g = 8
    while g <= min(nblk, budget):
        if nblk % g == 0:
            group = g
        g += 8
    return group


def _matvec_kernel(ws_ref, x_ref, m_ref, o_ref, scr_ref, *, nw: int,
                   window: int, window0: int, acc_dtype, blk: int,
                   group: int):
    """``group`` row blocks per program: gather each block's NW window
    slices of x, multiply into its dense window matrix, lane-reduce.

    Grouping amortizes the per-grid-step cost (~0.5 us measured -- the
    dominant term at 12k+ single-block programs) and enlarges the M
    DMA per step.  The output lives as ONE unblocked VMEM array (Mosaic
    requires block shapes with sublane dim divisible by 8 or
    whole-array; a (1, BLK) output block is neither) -- each program
    writes its own row slices, race-free on the sequentially-executing
    core."""
    j = pl.program_id(0)
    for t in range(group):
        i = j * group + t
        acc = None
        off = 0
        for wi in range(nw):
            w = window0 if wi == 0 else window
            # ws_ref holds SEGMENT rows (start // 128): x is laid out
            # (NSEG, 128) so a window is a dynamic SUBLANE slice --
            # plain address arithmetic in Mosaic, unlike dynamic lane
            # slices which lower to expensive rotates.
            sr = ws_ref[i * nw + wi]
            for k in range(w // 128):
                xseg = x_ref[pl.ds(sr + k, 1), :]           # (1, 128)
                xb = jnp.broadcast_to(xseg, (blk, 128)).astype(acc_dtype)
                prod = m_ref[t, :, off:off + 128].astype(acc_dtype) * xb
                acc = prod if acc is None else acc + prod
                off += 128
        # Lane-reduce into a STATIC scratch column: t is a Python-loop
        # constant, so this write needs no relayout.  The expensive
        # (BLK, G) -> (G, BLK) relayout happens once per program below
        # instead of once per block (group x fewer).
        scr_ref[:, t:t + 1] = jnp.sum(acc, axis=1, keepdims=True)
    # o_ref is the (group, blk) output BLOCK of this program (blocked
    # out_specs): an unblocked (NBLK, BLK) VMEM output lane-pads BLK to
    # 128 and overflows scoped VMEM at scale (21.9 MB at NBLK=43k, the
    # 1M compile OOM).
    o_ref[:, :] = scr_ref[:].T.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "group"))
def blockdense_matvec_pallas(op: BlockDenseOperator, x: jax.Array,
                             interpret: bool = False,
                             group: int = 0) -> jax.Array:
    """Drop-in Pallas replacement for ``blockdense_matvec`` (1-D x).

    Requires an operator built with ``align=128``: Mosaic only lowers
    VMEM lane slices whose start is provably 128-aligned.

    Bit-compatible reduction order with the XLA path is NOT guaranteed
    (both are float sums over the same NWW products); exactness tests
    compare against the plain ELL SpMV at matching tolerances.
    """
    nblk, blk, nww = op.m.shape
    nw = op.nw
    win, win0 = op.window, op.window0
    if win % 128 or win0 % 128:
        raise ValueError("pallas matvec needs 128-multiple window "
                         "widths (build with align=128)")
    r = op.n_rows
    acc = jnp.promote_types(op.m.dtype, jnp.float32)
    if group <= 0:
        # Target ~0.5 MB of M per grid step; see pick_group for the
        # Mosaic constraint (the unblocked-out form was the 22 MB
        # scoped-VMEM OOM at nblk ~ 43k).
        group = pick_group(nblk, blk * nww * 4, 1 << 19)
    else:
        while nblk % group:
            group -= 1

    pad = -(-(x.shape[0] + max(win, win0)) // 128) * 128 - x.shape[0]
    xp = jnp.pad(x, (0, pad)).reshape(-1, 128)               # (NSEG, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk // group,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),           # x, whole
            pl.BlockSpec((group, blk, nww), lambda j, ws: (j, 0, 0),
                         memory_space=pltpu.VMEM),           # M blocks
        ],
        out_specs=pl.BlockSpec((group, blk), lambda j, ws: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((blk, group), acc)],
    )
    y = pl.pallas_call(
        functools.partial(_matvec_kernel, nw=nw, window=win,
                          window0=win0, acc_dtype=acc, blk=blk,
                          group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk, blk), x.dtype),
        interpret=interpret,
    )(op.win_start.reshape(-1) // 128, xp, op.m)

    y = y.reshape(-1)[:r]
    if op.esc_w.shape[0]:
        contrib = op.esc_w * x[jnp.minimum(op.esc_cols, op.n_cols - 1)]
        y = y + jax.ops.segment_sum(
            contrib.astype(x.dtype), jnp.minimum(op.esc_rows, r),
            num_segments=r + 1, indices_are_sorted=True)[:r]
    if op.diag is not None:
        y = y + op.diag * x
    return y


# ---------------------------------------------------------------------------
# MXU variant: 128-row blocks, transposed 128x128 segment tiles.
#
# The VPU formulation above bottoms out at ~0.3 us per row block no
# matter the layout -- each block needs its own slice/broadcast/
# multiply/reduce chain of tiny (8, 128) ops, and Mosaic's per-op cost
# dominates.  Reformulating per segment as
#     y_block(1,128) += x_seg(1,128) @ M_seg^T(128,128)
# turns the whole chain into ONE MXU op per (block, segment) with all
# operands and results in natural lane-major layout: no broadcasts, no
# lane reductions, no relayouts.  M streams through the MXU at memory
# bandwidth; x rows are dynamic SUBLANE slices of the (NSEG, 128) x
# view.  This is the hot kernel of the framework.
# ---------------------------------------------------------------------------


def _mxu_kernel(sr_ref, x_ref, mt_ref, o_ref, scr_ref, *, nseg: int,
                group: int, acc_dtype):
    j = pl.program_id(0)
    for t in range(group):
        i = j * group + t
        acc = None
        for s in range(nseg):
            xr = x_ref[pl.ds(sr_ref[i * nseg + s], 1), :]    # (1, 128)
            p = jax.lax.dot_general(
                xr.astype(mt_ref.dtype), mt_ref[t, s],
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)            # (1, 128)
            acc = p if acc is None else acc + p
        scr_ref[t:t + 1, :] = acc
    # Blocked output (see _matvec_kernel): the full (NBLK, 128) in VMEM
    # is 22 MB at 1M scale.
    o_ref[:, :] = scr_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret",
                                             "group"))
def mxu_matvec_pallas(mt: jax.Array, seg_rows: jax.Array, x: jax.Array,
                      n_rows: int, interpret: bool = False,
                      group: int = 0) -> jax.Array:
    """y = A x for the transposed-tile form.

    mt:       (NBLK, NSEG, 128, 128) -- mt[b, s, l, r] = A[b*128 + r,
              seg_col(b, s)*128 + l]; zero where no entry.
    seg_rows: (NBLK, NSEG) int32 -- segment index into the (NSEG0, 128)
              view of x for each tile (any value pointing at zero-pad
              for unused tiles).
    Returns (NBLK*128,)[:n_rows].
    """
    nblk, nseg = seg_rows.shape
    acc = jnp.promote_types(mt.dtype, jnp.float32)
    if group <= 0:
        # Same group rule as the VPU kernel (see pick_group), with the
        # larger per-tile footprint of the 128x128 segments.
        group = pick_group(nblk, nseg * 65536, 1 << 20)
    else:
        while nblk % group:
            group -= 1

    pad = -(-(x.shape[0] + 128) // 128) * 128 - x.shape[0]
    xp = jnp.pad(x, (0, pad)).reshape(-1, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk // group,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),           # x view
            pl.BlockSpec((group, nseg, 128, 128),
                         lambda j, sr: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),           # tiles
        ],
        out_specs=pl.BlockSpec((group, 128), lambda j, sr: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((group, 128), acc)],
    )
    y = pl.pallas_call(
        functools.partial(_mxu_kernel, nseg=nseg, group=group,
                          acc_dtype=acc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk, 128), x.dtype),
        interpret=interpret,
    )(seg_rows.reshape(-1), xp, mt)
    return y.reshape(-1)[:n_rows]

"""Bucketed variable-window SpMV: pay only for the windows each row
block actually needs.

Measured motivation (scripts/analyze_spread.py, scripts/slab_totals.py
at 200k): after Morton ordering the median row block needs ~3 column
windows but the p99 block needs ~13 (torus seam rows), so the uniform
block-dense format (ops/blockdense.py) must size every block for the
tail -- its level-0 window matrix is ~1.1 GB at ~1% useful density,
and the V-cycle is bandwidth-bound on exactly that stream (VERDICT r2
Weak #1).  Variable windows cut the stream to ~280-460 MB.

Design: partition row blocks into BUCKETS by their greedy first-fit
window count, permute blocks so each bucket is contiguous, and build
one uniform BlockDenseOperator per bucket (window count = bucket cap).
The matvec runs one kernel per bucket (XLA or the Pallas kernel from
ops/pallas_blockdense.py) and un-permutes the output at BLOCK
granularity -- a (NBLK,)-row gather costing ~7 ns/row (PROGRESS.md
cost model), negligible at block >= 8.

Everything except bucket sizing runs on device; the conversion is
meant for the post-`check_diagnostics` phase (the process has already
synced) like attach_fast_operators.

Reference context: execution form for the hierarchy operators of
`/root/reference/src/multigrid.cpp`; no reference counterpart (it is a
sequential Eigen library).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gravomg_tpu.ops.blockdense import (BlockDenseOperator,
                                        blockdense_from_ell,
                                        blockdense_matvec, trim_escape)


class SlabOperator(NamedTuple):
    """y = diag*x + concat_k(bucket_k(x))[inv_block_perm] (module doc)."""

    diag: Optional[jax.Array]
    buckets: Tuple[BlockDenseOperator, ...]
    inv_block_perm: jax.Array       # (NBLK,) int32 into concat'd blocks
    n_rows: int
    n_cols: int
    block: int
    use_pallas: bool = True         # static: kernel choice per bucket
    mxu: bool = False               # static: transposed-tile MXU form

    @property
    def m_bytes(self) -> int:
        return sum(b.m.size * b.m.dtype.itemsize for b in self.buckets)


jax.tree_util.register_pytree_node(
    SlabOperator,
    lambda op: ((op.diag, op.buckets, op.inv_block_perm),
                (op.n_rows, op.n_cols, op.block, op.use_pallas, op.mxu)),
    lambda aux, ch: SlabOperator(*ch, *aux),
)


@functools.partial(jax.jit, static_argnames=("block", "window", "nw_max",
                                             "align"))
def window_counts(cols: jax.Array, valid: jax.Array, block: int,
                  window: int, nw_max: int = 24, align: int = 0):
    """Per-block greedy first-fit window counts (same rule as
    blockdense_from_ell's far-window placement; ``align`` floors each
    start like blockdense_from_ell(align=...)).  Returns
    ((NBLK,) int32 counts, (NBLK,) int32 first-window start, overflow).
    """
    r, k = cols.shape
    nblk = -(-r // block)
    imax = jnp.iinfo(jnp.int32).max
    safe = jnp.where(valid, cols, imax)
    bc = jnp.pad(safe, ((0, nblk * block - r), (0, 0)),
                 constant_values=imax).reshape(nblk, block * k)
    remaining = bc
    counts = jnp.zeros((nblk,), jnp.int32)
    first = jnp.full((nblk,), 0, jnp.int32)
    for wi in range(nw_max):
        s = jnp.min(remaining, axis=1)
        if align:
            s = jnp.where(s < imax, (s // align) * align, s)
        has = s < imax
        if wi == 0:
            first = jnp.where(has, s, 0).astype(jnp.int32)
        counts = counts + has.astype(jnp.int32)
        remaining = jnp.where(remaining < s[:, None] + window, imax,
                              remaining)
    overflow = jnp.any(jnp.min(remaining, axis=1) < imax)
    return counts, first, overflow


# Bucket caps: counts round UP to the nearest entry, bounding both the
# number of compiled kernels and the padding waste (< ~25%).
_BUCKET_CAPS = (1, 2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24)


def slab_from_ell(cols: jax.Array, vals: jax.Array, valid: jax.Array,
                  n_cols: int, diag: Optional[jax.Array] = None,
                  block: int = 8, window: int = 128, nw_max: int = 24,
                  escape_cap: int = 4096, dtype=None,
                  align: int = 128,
                  use_pallas: Optional[bool] = None,
                  mxu: bool = False) -> SlabOperator:
    """Build a SlabOperator from (R, K) ELL columns/values/mask.

    Host-interactive (syncs the per-block window counts); call after
    the device-resident build phase, like attach_fast_operators.
    Raises if nw_max windows cannot cover some block (pathological
    ordering) -- fall back to the uniform format in that case.

    ``mxu=True`` selects the transposed-tile MXU form (forces
    block=128, window=128): each (block, segment) is stored as a
    128x128 tile mt[s, l, r] = A[row r, seg*128 + l] so the matvec is
    one (1,128)@(128,128) MXU op per tile -- the VPU form bottoms out
    at ~0.3 us/block of Mosaic per-op overhead regardless of geometry
    (measured at 200k), while MXU tiles stream at memory bandwidth.
    """
    if mxu:
        block, window, align = 128, 128, 128
    r, k = cols.shape
    if vals is not None:
        valid = valid & (vals != 0.0)
    counts, first, ovf = window_counts(cols, valid, block, window, nw_max,
                                       align=align)
    if bool(ovf):
        raise ValueError(
            f"slab_from_ell: >{nw_max} windows needed for some block; "
            "is the cloud spatially ordered?")
    counts_h = np.asarray(counts)
    nblk = counts_h.shape[0]
    caps = np.asarray(_BUCKET_CAPS, np.int32)
    caps = caps[caps <= max(nw_max, 1)]
    # Empty blocks (all-padding) ride in the smallest bucket.
    cap_idx = np.searchsorted(caps, np.maximum(counts_h, 1))
    perm = np.argsort(cap_idx, kind="stable").astype(np.int32)

    # Permute rows into bucket order (device gather, conversion-only).
    rpad = nblk * block
    cols_p = jnp.pad(jnp.where(valid, cols, 0), ((0, rpad - r), (0, 0)))
    valid_p = jnp.pad(valid, ((0, rpad - r), (0, 0)))
    vals_p = jnp.pad(vals, ((0, rpad - r), (0, 0)))
    row_perm = (jnp.asarray(perm)[:, None] * block
                + jnp.arange(block)[None, :]).reshape(-1)
    cols_s = cols_p[row_perm]
    vals_s = vals_p[row_perm]
    valid_s = valid_p[row_perm]
    first_s = np.asarray(first)[perm]

    buckets = []
    start = 0
    # Each bucket's block count is padded up to a multiple of 32 so the
    # Pallas kernel can group blocks per grid step regardless of the
    # bucket's (possibly prime) natural size; pad blocks are all-zero
    # rows whose output the inverse permutation never reads.  The
    # inverse permutation maps against PADDED offsets.
    BPAD = 32
    inv = np.empty((nblk,), np.int32)
    pad_off = 0
    for ci in range(len(caps)):
        nb = int(np.sum(cap_idx == ci))
        if nb == 0:
            continue
        cap = int(caps[ci])
        # Small buckets still pad to a multiple of 8 blocks: Mosaic
        # block shapes need an 8-divisible second-minor dim, and the
        # kernel's blocked output spec needs a valid group size.
        nbp = (-(-nb // BPAD) * BPAD if nb > BPAD
               else -(-nb // 8) * 8)
        lo, hi = start * block, (start + nb) * block
        c_b, v_b, m_b = cols_s[lo:hi], vals_s[lo:hi], valid_s[lo:hi]
        anch = first_s[start:start + nb]
        if nbp > nb:
            padn = (nbp - nb) * block
            c_b = jnp.pad(c_b, ((0, padn), (0, 0)))
            v_b = jnp.pad(v_b, ((0, padn), (0, 0)))
            m_b = jnp.pad(m_b, ((0, padn), (0, 0)))
            anch = np.pad(anch, (0, nbp - nb))
        # Anchor window 0 at each block's first-fit start so the
        # placement matches window_counts exactly (blockdense's default
        # anchor is the scaled diagonal, which is not first-fit).
        bop, b_ovf = blockdense_from_ell(
            c_b, v_b, m_b, n_cols,
            diag=None, block=block, window=window, nw=cap,
            escape_cap=escape_cap, window0=window,
            anchors=jnp.asarray(anch + window // 2), align=align)
        if bool(b_ovf):
            raise ValueError("slab_from_ell: escape overflow in bucket "
                             f"cap={cap} (escape_cap={escape_cap})")
        # Static escape_cap slots would cost ~10 ns each per matvec
        # even when empty; slice to the actual fill (host sync, fine
        # here -- this whole builder is host-interactive).
        bop = trim_escape(bop)
        if mxu:
            # (NB, 128, cap*128) row-major -> (NB, cap, 128, 128)
            # transposed tiles [b, s, l, r]; one-time conversion copy.
            mt = bop.m.reshape(nbp, 128, cap, 128).transpose(0, 2, 3, 1)
            bop = bop._replace(m=mt)
        if dtype is not None:
            bop = bop._replace(m=bop.m.astype(dtype))
        buckets.append(bop)
        inv[perm[start:start + nb]] = pad_off + np.arange(nb)
        start += nb
        pad_off += nbp

    if use_pallas is None:
        # Mosaic kernels only lower on TPU; elsewhere (CPU tests,
        # virtual multichip meshes) the per-bucket XLA path is used.
        use_pallas = jax.default_backend() == "tpu"
    return SlabOperator(diag=diag, buckets=tuple(buckets),
                        inv_block_perm=jnp.asarray(inv), n_rows=r,
                        n_cols=n_cols, block=block,
                        use_pallas=bool(use_pallas), mxu=mxu)


def _bucket_escape(b: BlockDenseOperator, y: jax.Array,
                   x: jax.Array) -> jax.Array:
    """Apply a bucket's sorted-COO escape chute to its flat output."""
    if not b.esc_w.shape[0]:
        return y
    r = y.shape[0]
    contrib = b.esc_w * x[jnp.minimum(b.esc_cols, b.n_cols - 1)]
    return y + jax.ops.segment_sum(
        contrib.astype(x.dtype), jnp.minimum(b.esc_rows, r),
        num_segments=r + 1, indices_are_sorted=True)[:r]


def _mxu_bucket_matvec_xla(b: BlockDenseOperator, x: jax.Array
                           ) -> jax.Array:
    """XLA fallback for a transposed-tile bucket (CPU tests, virtual
    meshes): gather the segment rows, contract with the tiles."""
    nb, k, _, _ = b.m.shape
    segs = b.win_start // 128                             # (nb, k)
    pad = -(-(x.shape[0] + 128) // 128) * 128 - x.shape[0]
    x2 = jnp.pad(x, (0, pad)).reshape(-1, 128)
    wins = x2[segs]                                       # (nb, k, 128)
    y = jnp.einsum("bkl,bklr->br", wins.astype(b.m.dtype), b.m,
                   preferred_element_type=jnp.promote_types(
                       b.m.dtype, jnp.float32)).astype(x.dtype)
    return _bucket_escape(b, y.reshape(-1), x)


def slab_matvec(op: SlabOperator, x: jax.Array,
                pallas: Optional[bool] = None) -> jax.Array:
    """y = A x via per-bucket kernels + block-level un-permutation."""
    if pallas is None:
        pallas = op.use_pallas
    if op.mxu:
        if pallas:
            from gravomg_tpu.ops.pallas_blockdense import \
                mxu_matvec_pallas

            def bucket_mv(b, v):
                y = mxu_matvec_pallas(b.m, b.win_start // 128, v,
                                      b.m.shape[0] * 128)
                return _bucket_escape(b, y, v)
        else:
            bucket_mv = _mxu_bucket_matvec_xla
    elif pallas:
        from gravomg_tpu.ops.pallas_blockdense import \
            blockdense_matvec_pallas as bucket_mv
    else:
        bucket_mv = blockdense_matvec
    parts = [bucket_mv(b, x).reshape(-1, op.block) for b in op.buckets]
    ycat = jnp.concatenate(parts, axis=0)            # (NBLK, BLK)
    y = ycat[op.inv_block_perm].reshape(-1)[:op.n_rows]
    if op.diag is not None:
        y = y + op.diag * x
    return y


def slab_from_operator(op, **kw) -> SlabOperator:
    """Square-operator convenience wrapper (keeps the diagonal exact)."""
    return slab_from_ell(op.neighbors, op.offdiag, op.mask,
                         op.num_vertices, diag=op.diag, **kw)

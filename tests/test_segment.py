"""Unit tests for the sort-based group-by primitives (ops/segment.py)."""

import numpy as np
import jax.numpy as jnp

from gravomg_tpu.ops.segment import build_ell_rows, group_ordered
from gravomg_tpu.types import INVALID_INDEX


def _brute_ell(rows, cols, valid, num_rows, vals=None, combine="add"):
    table = {}
    for i in range(len(rows)):
        if not valid[i]:
            continue
        key = (int(rows[i]), int(cols[i]))
        if vals is None:
            table[key] = None
        elif key not in table:
            table[key] = vals[i]
        elif combine == "add":
            table[key] += vals[i]
        else:
            table[key] = min(table[key], vals[i])
    out = [[] for _ in range(num_rows)]
    for (r, c), v in sorted(table.items()):
        out[r].append((c, v))
    return out


def test_build_ell_rows_dedup_and_order(rng):
    e, n, k = 500, 40, 16
    rows = rng.integers(0, n, e)
    cols = rng.integers(0, n, e)
    valid = rng.random(e) > 0.2
    vals = rng.normal(size=e)
    res = build_ell_rows(jnp.asarray(rows, jnp.int32),
                         jnp.asarray(cols, jnp.int32),
                         jnp.asarray(valid), n, k,
                         values=jnp.asarray(vals), combine="add")
    ref = _brute_ell(rows, cols, valid, n, vals, "add")
    assert not bool(res.overflow)
    c_np = np.asarray(res.columns)
    v_np = np.asarray(res.values)
    for r in range(n):
        entries = ref[r]
        got = c_np[r][c_np[r] != INVALID_INDEX]
        np.testing.assert_array_equal(got, [c for c, _ in entries])
        np.testing.assert_allclose(v_np[r][:len(entries)],
                                   [v for _, v in entries], rtol=1e-12)
        assert int(np.asarray(res.counts)[r]) == len(entries)


def test_build_ell_rows_min_combine(rng):
    e, n, k = 300, 20, 16
    rows = rng.integers(0, n, e)
    cols = rng.integers(0, n, e)
    valid = np.ones(e, bool)
    vals = rng.normal(size=e)
    res = build_ell_rows(jnp.asarray(rows, jnp.int32),
                         jnp.asarray(cols, jnp.int32),
                         jnp.asarray(valid), n, k,
                         values=jnp.asarray(vals), combine="min")
    ref = _brute_ell(rows, cols, valid, n, vals, "min")
    c_np = np.asarray(res.columns)
    v_np = np.asarray(res.values)
    for r in range(n):
        entries = ref[r]
        got = c_np[r][c_np[r] != INVALID_INDEX]
        np.testing.assert_array_equal(got, [c for c, _ in entries])
        np.testing.assert_allclose(v_np[r][:len(entries)],
                                   [v for _, v in entries], rtol=1e-12)


def test_build_ell_rows_overflow_flag(rng):
    rows = jnp.zeros(10, jnp.int32)
    cols = jnp.arange(10, dtype=jnp.int32)
    res = build_ell_rows(rows, cols, jnp.ones(10, bool), 4, 4)
    assert bool(res.overflow)
    np.testing.assert_array_equal(np.asarray(res.columns)[0],
                                  [0, 1, 2, 3])


def test_group_ordered(rng):
    e, n, m = 200, 15, 32
    rows = rng.integers(0, n, e)
    pay = rng.permutation(e)
    valid = rng.random(e) > 0.3
    table, counts, ovf = group_ordered(
        jnp.asarray(rows, jnp.int32), jnp.asarray(pay, jnp.int32),
        jnp.asarray(valid), n, m)
    assert not bool(ovf)
    t = np.asarray(table)
    for r in range(n):
        expect = sorted(pay[i] for i in range(e) if valid[i] and rows[i] == r)
        got = t[r][t[r] != INVALID_INDEX]
        np.testing.assert_array_equal(got, expect)
        assert int(np.asarray(counts)[r]) == len(expect)

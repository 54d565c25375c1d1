"""Gorilla codec property tests: encode∘decode == identity (bit-exact),
including NaN, ±0.0, constant runs, monotonic deltas, random walks,
single-point and empty series (FIXTURES.md §4)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from chainalytic_framework_spark.operators.codec import decode_series, encode_series


def _roundtrip(ts, vals):
    from chainalytic_framework_spark.operators.codec import decode_series_many

    blob = encode_series(np.asarray(ts, dtype=np.int64), np.asarray(vals))
    ts2, vals2 = decode_series(blob)
    np.testing.assert_array_equal(np.asarray(ts, dtype=np.int64), ts2)
    a = np.asarray(vals)
    if a.dtype == np.float64:
        np.testing.assert_array_equal(a.view(np.uint64), vals2.view(np.uint64))
    else:
        np.testing.assert_array_equal(a, vals2)
    # every property case also exercises the transposed batch decoder
    if len(ts2) > 0:
        offs, tsm, vm = decode_series_many([blob, blob])
        for k in (0, 1):
            np.testing.assert_array_equal(tsm[offs[k]:offs[k + 1]], ts2)
            np.testing.assert_array_equal(
                vm[offs[k]:offs[k + 1]].view(np.uint64), vals2.view(np.uint64)
            )
    return blob


def test_empty():
    blob = encode_series(np.array([], dtype=np.int64), np.array([], dtype=np.float64))
    ts, vals = decode_series(blob)
    assert len(ts) == 0 and len(vals) == 0


def test_single_point():
    _roundtrip([1700000000], np.array([3.14159]))


def test_constant_run_compresses():
    n = 1000
    ts = 1700000000 + 60 * np.arange(n)
    vals = np.full(n, 42.5)
    blob = _roundtrip(ts, vals)
    # constant values + constant deltas: ~2 bits/point ⇒ far below raw 16B
    assert len(blob) < n  # < 1 byte per point vs 16 raw

def test_monotonic_delta():
    n = 500
    ts = 1700000000 + np.cumsum(np.arange(n))
    vals = np.arange(n, dtype=np.float64) * 0.001
    _roundtrip(ts, vals)


def test_nan_and_zeros():
    ts = 1700000000 + 60 * np.arange(6)
    vals = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-308])
    _roundtrip(ts, vals)


def test_int64_values():
    ts = 1700000000 + np.array([0, 1, 100, 101, 102])
    vals = np.array([5, 5, -7, 2**62, 0], dtype=np.int64)
    _roundtrip(ts, vals)


def test_irregular_timestamps():
    ts = np.array([0, 1, 2, 1000000, 1000001, 2**40, 2**40 + 59])
    vals = np.random.default_rng(1).standard_normal(len(ts))
    _roundtrip(ts, vals)


def test_random_walk_big():
    rng = np.random.default_rng(42)
    n = 20_000
    ts = 1700000000 + np.cumsum(rng.integers(1, 600, n))
    vals = np.cumsum(rng.standard_normal(n))
    blob = _roundtrip(ts, vals)
    assert len(blob) < n * 16  # beats raw encoding even on random walk


@settings(max_examples=60, deadline=None)
@given(
    deltas=st.lists(st.integers(min_value=0, max_value=2**33), min_size=1, max_size=200),
    data=st.data(),
)
def test_property_float_series(deltas, data):
    ts = 1700000000 + np.cumsum(np.array(deltas, dtype=np.int64))
    vals = data.draw(
        st.lists(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            min_size=len(ts),
            max_size=len(ts),
        )
    )
    _roundtrip(ts, np.array(vals, dtype=np.float64))


@settings(max_examples=40, deadline=None)
@given(
    deltas=st.lists(st.integers(min_value=0, max_value=2**20), min_size=1, max_size=100),
    data=st.data(),
)
def test_property_int_series(deltas, data):
    ts = np.cumsum(np.array(deltas, dtype=np.int64))
    vals = data.draw(
        st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            min_size=len(ts),
            max_size=len(ts),
        )
    )
    _roundtrip(ts, np.array(vals, dtype=np.int64))


def test_transposed_batch_decode_equals_sequential():
    """decode_series_many (the lock-step transposed batch decoder) must
    be bit-identical to per-blob sequential decode_series, across mixed
    lengths, dod classes incl. 68-bit raw, constant runs, and
    single-point blobs."""
    from chainalytic_framework_spark.operators.codec import decode_series_many

    rng = np.random.default_rng(7)
    blobs, expected = [], []
    for n in (1, 2, 3, 17, 400, 1000, 5):
        ts = 1700000000 + np.cumsum(
            rng.choice([1, 60, 61, 300, 5000, 2**35], size=n)
        ).astype(np.int64)
        vals = np.where(
            rng.random(n) < 0.3, 7, np.cumsum(rng.integers(-5, 6, size=n))
        ).astype(np.int64)
        blobs.append(encode_series(ts, vals))
        expected.append((ts, vals))
    offsets, ts_flat, vals_flat = decode_series_many(blobs)
    assert vals_flat.dtype == np.int64
    for i, (ts, vals) in enumerate(expected):
        lo, hi = offsets[i], offsets[i + 1]
        ts2, vals2 = decode_series(blobs[i])
        np.testing.assert_array_equal(ts_flat[lo:hi], ts2)
        np.testing.assert_array_equal(vals_flat[lo:hi], vals2)
        np.testing.assert_array_equal(ts_flat[lo:hi], ts)
        np.testing.assert_array_equal(vals_flat[lo:hi], vals)


def test_transposed_batch_decode_floats_and_empty():
    from chainalytic_framework_spark.operators.codec import decode_series_many

    rng = np.random.default_rng(11)
    blobs = []
    for n in (6, 1, 250):
        ts = 1700000000 + 60 * np.arange(n)
        vals = np.where(rng.random(n) < 0.4, 42.5, np.cumsum(rng.standard_normal(n)))
        if n == 6:
            vals = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-308])
        blobs.append(encode_series(ts, vals))
    offsets, ts_flat, vals_flat = decode_series_many(blobs)
    assert vals_flat.dtype == np.float64
    for i, blob in enumerate(blobs):
        ts2, vals2 = decode_series(blob)
        lo, hi = offsets[i], offsets[i + 1]
        np.testing.assert_array_equal(ts_flat[lo:hi], ts2)
        np.testing.assert_array_equal(
            vals_flat[lo:hi].view(np.uint64), vals2.view(np.uint64)
        )

    offsets, ts_flat, vals_flat = decode_series_many([])
    assert len(ts_flat) == 0 and list(offsets) == [0]


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        decode_series(b"NOPE" + b"\x00" * 32)


def test_encode_series_many_byte_identical():
    """Batch encode must produce byte-identical blobs to per-series
    encode_series across mixed lengths (incl. 0/1-point), timestamp
    classes, and both value kinds."""
    from chainalytic_framework_spark.operators.codec import encode_series_many

    rng = np.random.default_rng(3)
    ns = [0, 1, 2, 30, 7, 0, 500, 1, 64, 3]
    tp, vp, ref = [], [], []
    for n in ns:
        ts = (
            1700000000 + 60 * np.arange(n, dtype=np.int64)
            if rng.random() < 0.5
            else 1700000000
            + np.cumsum(rng.choice([1, 60, 300, 2**35], size=n)).astype(np.int64)
        )
        vals = np.where(
            rng.random(n) < 0.4, 7, np.cumsum(rng.integers(-9, 10, size=n))
        ).astype(np.int64)
        tp.append(ts)
        vp.append(vals)
        ref.append(encode_series(ts, vals))
    got = encode_series_many(
        np.concatenate(tp), np.concatenate(vp).astype(np.int64), np.array(ns)
    )
    assert [bytes(b) for b in got] == [bytes(b) for b in ref]

    tp, vp, ref = [], [], []
    for n in (5, 1, 200, 6):
        ts = 1700000000 + 60 * np.arange(n, dtype=np.int64)
        vals = np.where(rng.random(n) < 0.3, 42.5, np.cumsum(rng.standard_normal(n)))
        if n == 6:
            vals = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-308])
        tp.append(ts)
        vp.append(vals)
        ref.append(encode_series(ts, vals))
    got = encode_series_many(
        np.concatenate(tp), np.concatenate(vp), np.array([5, 1, 200, 6])
    )
    assert [bytes(b) for b in got] == [bytes(b) for b in ref]


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_property_encode_many_matches_per_series(data):
    """Randomized ragged batches (empty/1-point/irregular series, both
    value kinds) — batch encode must stay byte-identical to per-series
    encode, and batch decode must invert it."""
    from chainalytic_framework_spark.operators.codec import (
        decode_series_many,
        encode_series_many,
    )

    kind = data.draw(st.sampled_from(["int", "float"]))
    ns = data.draw(st.lists(st.integers(min_value=0, max_value=40),
                            min_size=1, max_size=12))
    tp, vp, ref = [], [], []
    for n in ns:
        deltas = data.draw(st.lists(
            st.integers(min_value=0, max_value=2**34),
            min_size=n, max_size=n))
        ts = 1700000000 + np.cumsum(np.array(deltas, dtype=np.int64))
        if kind == "int":
            vals = np.array(data.draw(st.lists(
                st.integers(min_value=-(2**62), max_value=2**62),
                min_size=n, max_size=n)), dtype=np.int64)
        else:
            vals = np.array(data.draw(st.lists(
                st.floats(allow_nan=True, allow_infinity=True, width=64),
                min_size=n, max_size=n)), dtype=np.float64)
        tp.append(ts)
        vp.append(vals)
        ref.append(encode_series(ts, vals))
    ts_flat = np.concatenate(tp) if tp else np.array([], dtype=np.int64)
    vals_flat = np.concatenate(vp) if vp else np.array(
        [], dtype=np.int64 if kind == "int" else np.float64)
    got = encode_series_many(ts_flat, vals_flat, np.array(ns))
    assert [bytes(b) for b in got] == [bytes(b) for b in ref]
    offs, tsd, vd = decode_series_many(got)
    np.testing.assert_array_equal(tsd, ts_flat)
    if kind == "float":
        np.testing.assert_array_equal(vd.view(np.uint64), vals_flat.view(np.uint64))
    else:
        np.testing.assert_array_equal(vd, vals_flat)

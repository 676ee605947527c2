"""Gorilla codec: round-trip property tests + compression sanity (F6)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tslib_spark.codec.gorilla import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)


def rt_values(arr):
    out = decode_values(encode_values(np.asarray(arr, dtype=np.float64)))
    np.testing.assert_array_equal(
        np.asarray(arr, dtype=np.float64).view(np.uint64), out.view(np.uint64)
    )


def rt_ts(arr):
    out = decode_timestamps(encode_timestamps(np.asarray(arr, dtype=np.int64)))
    np.testing.assert_array_equal(np.asarray(arr, dtype=np.int64), out)


@pytest.mark.parametrize(
    "case",
    [
        [],
        [0.0],
        [-0.0],
        [0.0, -0.0, 0.0],
        [np.nan, np.nan, 1.0, np.nan],
        [1.0] * 100,
        [1.0, -1.0] * 50,
        [np.inf, -np.inf, np.nan, 0.0],
        list(np.linspace(-1e300, 1e300, 37)),
        [2.0**-1074, 2.0**1023, 5e-324],
    ],
)
def test_value_roundtrip_edge_cases(case):
    rt_values(case)


@pytest.mark.parametrize(
    "case",
    [
        [],
        [0],
        [1700000000],
        [0, 60],
        list(range(0, 60 * 512, 60)),  # regular 1-min grid
        [0, 60, 120, 300, 301, 302, 10**15],  # irregular with a huge jump
        [-(2**62), 0, 2**62],
        list(range(1024)),  # 2^k length
    ],
)
def test_ts_roundtrip_edge_cases(case):
    rt_ts(case)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=300,
    )
)
def test_value_roundtrip_property(xs):
    rt_values(xs)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**61), max_value=2**61),
        min_size=0,
        max_size=300,
    )
)
def test_ts_roundtrip_property(xs):
    rt_ts(xs)


def test_regular_grid_compresses_hard():
    # 1-min grid: dod == 0 everywhere → ~1 bit/point after the two raw 64s
    ts = np.arange(0, 60 * 4096, 60, dtype=np.int64)
    blob = encode_timestamps(ts)
    bits_per_point = (len(blob) - 4) * 8 / len(ts)
    assert bits_per_point < 1.2
    # constant values: ~1 bit/point after the raw first
    vals = np.full(4096, 3.25)
    vblob = encode_values(vals)
    assert (len(vblob) - 4) * 8 / len(vals) < 1.2


def test_noisy_values_still_beat_raw():
    rng = np.random.default_rng(0)
    # random walk (realistic metric series): should beat 64 bits/point
    vals = np.cumsum(rng.normal(0, 0.1, 4096)) + 100.0
    blob = encode_values(vals)
    assert (len(blob) - 4) * 8 / len(vals) < 64


def test_chunk_table_roundtrip(spark):
    import pandas as pd

    rng = np.random.default_rng(1)
    rows = []
    for key in ["a", "b"]:
        n = 5000  # spans two chunks
        idx = np.cumsum(rng.integers(1, 4, n)).astype(np.int64)
        vals = np.round(rng.normal(size=n), 3)
        rows.append(
            pd.DataFrame({"series_key": key, "bucket_idx": idx, "value": vals})
        )
    pdf = pd.concat(rows, ignore_index=True)
    df = spark.createDataFrame(pdf)

    from tslib_spark.codec.chunks import chunk_stats, decode_chunks, encode_chunks

    chunks = encode_chunks(df, ["series_key"]).cache()
    # chunks are (series, time-window) bounded: one per occupied 4096-tick
    # window (skew salting — a head series spreads across tasks), each
    # within the point bound
    cpdf = chunks.toPandas()
    assert len(cpdf) >= 4 and (cpdf["n_points"] <= 4096).all()
    assert cpdf.groupby("series_key")["n_points"].sum().eq(5000).all()
    stats = chunk_stats(chunks).collect()[0]
    assert stats["points"] == 10000
    assert stats["compression_ratio"] > 1.0

    back = decode_chunks(chunks, ["series_key"]).toPandas()
    got = back.sort_values(["series_key", "bucket_idx"]).reset_index(drop=True)
    want = pdf.sort_values(["series_key", "bucket_idx"]).reset_index(drop=True)
    np.testing.assert_array_equal(got["bucket_idx"].to_numpy(), want["bucket_idx"].to_numpy())
    np.testing.assert_array_equal(got["value"].to_numpy(), want["value"].to_numpy())


@given(
    st.lists(
        st.lists(
            st.floats(allow_nan=True, allow_infinity=True, width=64), min_size=1, max_size=40
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_multi_encode_matches_single_property(series_list):
    """encode_*_multi must be per-series bit-identical to the single-series
    encoders for arbitrary series batches (chain resets at every start)."""
    from tslib_spark.codec.gorilla import (
        encode_timestamps,
        encode_timestamps_multi,
        encode_values,
        encode_values_multi,
    )

    vals = [np.asarray(s, dtype=np.float64) for s in series_list]
    tss = [
        np.cumsum(np.abs(np.nan_to_num(v, posinf=3.0, neginf=-3.0)) * 100 + 1).astype(np.int64)
        for v in vals
    ]
    starts = np.cumsum([0] + [len(v) for v in vals[:-1]]).astype(np.int64)
    mv = encode_values_multi(np.concatenate(vals), starts)
    mt = encode_timestamps_multi(np.concatenate(tss), starts)
    for i, (v, t) in enumerate(zip(vals, tss)):
        assert mv[i] == encode_values(v)
        assert mt[i] == encode_timestamps(t)


def test_blob_version_marker_rejects_unversioned():
    """r4 layout hardening: the header carries explicit version bits, and a
    v1-era blob (top/version bits all zero — any plain uint32 count) is
    rejected with a clear error instead of silently decoding as a constant
    series / regular grid on the degenerate path."""
    import numpy as np
    import pytest

    from tslib_spark.codec.gorilla import (
        decode_timestamps,
        decode_values,
        encode_timestamps,
        encode_values,
    )

    # round-trip still exact with the marker present
    vals = np.array([1.5, 1.5, 2.25, float("nan"), -0.0])
    np.testing.assert_array_equal(
        np.nan_to_num(decode_values(encode_values(vals)), nan=9.9),
        np.nan_to_num(vals, nan=9.9),
    )
    ts = np.array([60, 120, 180, 240], dtype=np.int64)
    np.testing.assert_array_equal(decode_timestamps(encode_timestamps(ts)), ts)

    # a v1-style blob: plain count header (version bits 0) + payload bytes
    fake_v1 = np.uint32(5).tobytes() + b"\x00" * 16
    with pytest.raises(ValueError, match="version"):
        decode_values(fake_v1)
    with pytest.raises(ValueError, match="version"):
        decode_timestamps(fake_v1)

    # empty timestamp blob carries the marker too
    assert decode_timestamps(encode_timestamps(np.array([], dtype=np.int64))).size == 0


def _strip_version(blob: bytes) -> bytes:
    """What a pre-version-bits build persisted: identical payload, version
    field zero."""
    from tslib_spark.codec.gorilla import _VER_MASK

    hdr = np.frombuffer(blob[:4], dtype=np.uint32)[0]
    return (hdr & np.uint32(0xFFFFFFFF ^ _VER_MASK)).tobytes() + blob[4:]


def test_migrate_v1_blob_restores_current_layout():
    """ADVICE r4: durable blobs written before the header gained version
    bits must have a migration path, not just a loud failure. The payload
    never changed, so migration is a verified 4-byte header rewrite."""
    from tslib_spark.codec.gorilla import migrate_v1_blob

    vals = np.array([3.5, 3.5, -1.25, float("nan"), 7.0])
    v2 = encode_values(vals)
    v1 = _strip_version(v2)
    with pytest.raises(ValueError, match="version"):
        decode_values(v1)  # loud failure unchanged
    mig = migrate_v1_blob(v1, "values")
    assert mig == v2
    assert migrate_v1_blob(mig, "values") == mig  # idempotent on current blobs

    ts = np.cumsum(np.arange(1, 900, dtype=np.int64) % 7 + 55)
    t2 = encode_timestamps(ts)
    assert migrate_v1_blob(_strip_version(t2), "timestamps") == t2
    # empty-series timestamp blob (bare v1 header)
    e2 = encode_timestamps(np.empty(0, dtype=np.int64))
    assert migrate_v1_blob(_strip_version(e2), "timestamps") == e2

    # a blob that is NOT the v1 sidecar layout must be refused, not guessed
    bad = np.uint32(5).tobytes() + b"\x00" * 40
    with pytest.raises(ValueError):
        migrate_v1_blob(bad, "values")


def test_migrate_v1_state_chunks_dataframe(spark):
    """Tier-level migration: every statechunks blob column gets the
    verified header rewrite; non-blob columns pass through untouched."""
    import pandas as pd

    from tslib_spark.codec.gorilla import migrate_v1_state_chunks

    minutes = np.arange(0, 300, 60, dtype=np.int64)
    cnts = np.array([3, 1, 4, 1, 5], dtype=np.int64)
    sums = np.array([10, 20, 30, 40, 50], dtype=np.int64)
    mins = np.array([0.5, -1.5, 2.0, float("nan"), 0.0])
    maxs = mins + 1.0
    row = {
        "_sid": 7,
        "chunk_id": 0,
        "n_points": 5,
        "ts_start": 0,
        "ts_blob": encode_timestamps(minutes),
        "cnt_blob": encode_timestamps(cnts),
        "sum_blob": encode_timestamps(sums),
        "min_blob": encode_values(mins),
        "max_blob": encode_values(maxs),
    }
    v1_row = dict(row)
    for c in ("ts_blob", "cnt_blob", "sum_blob", "min_blob", "max_blob"):
        v1_row[c] = _strip_version(row[c])
    df = spark.createDataFrame(pd.DataFrame([v1_row]))
    got = migrate_v1_state_chunks(df).toPandas().iloc[0]
    for c in ("ts_blob", "cnt_blob", "sum_blob", "min_blob", "max_blob"):
        assert bytes(got[c]) == row[c], c
    assert got["_sid"] == 7 and got["n_points"] == 5

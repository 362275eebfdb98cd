"""Tests for the from-scratch portable Roaring bitmap codec
(sources/roaring.py): round trips across container shapes, format
invariants, and a hypothesis property against the Python-set model."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deg04_local_data_lake_spark.sources.roaring import (
    SERIAL_COOKIE_NO_RUNCONTAINER,
    deserialize,
    serialize,
)


def _rt(values):
    return deserialize(serialize(values))


def test_empty_and_singletons():
    assert _rt([]).tolist() == []
    assert _rt([0]).tolist() == [0]
    assert _rt([2**32 - 1]).tolist() == [2**32 - 1]


def test_duplicates_collapse_and_order_is_irrelevant():
    assert _rt([5, 3, 5, 3, 1]).tolist() == [1, 3, 5]


def test_array_to_bitmap_container_boundary():
    # 4096 values stay an array container; 4097 promote to a bitmap —
    # both must round-trip identically
    base = 7 << 16
    for n in (4096, 4097):
        vals = list(range(base, base + n))
        assert _rt(vals).tolist() == vals


def test_multi_container_spanning_keys():
    vals = [1, 65535, 65536, 131072, 2**31, 2**32 - 2]
    assert _rt(vals).tolist() == sorted(vals)


def test_cookie_and_rejections():
    data = serialize([1, 2, 3])
    cookie, = struct.unpack_from("<i", data, 0)
    assert cookie == SERIAL_COOKIE_NO_RUNCONTAINER
    with pytest.raises(ValueError, match="run containers"):
        deserialize(struct.pack("<i", 12347) + data[4:])
    with pytest.raises(ValueError, match="not a portable roaring"):
        deserialize(struct.pack("<i", 99) + data[4:])


def test_dense_container_compresses():
    # a full 65536-value container is 8 KiB as a bitmap, not 128 KiB raw
    vals = np.arange(65536, dtype=np.uint32)
    data = serialize(vals)
    assert len(data) < 10_000
    assert np.array_equal(deserialize(data), vals)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**32 - 1),
        max_size=3000,
    )
)
def test_round_trip_matches_set_model(values):
    got = _rt(values)
    want = sorted(set(values))
    assert got.tolist() == want


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 70000))
def test_contiguous_runs_round_trip(start):
    vals = np.arange(start, start + 66000, dtype=np.uint32)
    assert np.array_equal(deserialize(serialize(vals)), vals)


# ---------------------------------------------------------------------------
# RoaringBitmapArray framing + Z85 (Delta deletion-vector serialization)
# ---------------------------------------------------------------------------


def test_array_framing_round_trip():
    from deg04_local_data_lake_spark.sources.roaring import (
        RBM_ARRAY_MAGIC,
        deserialize_array,
        serialize_array,
    )
    import struct

    vals = [0, 5, 70000, 2**32 + 3, 2**40]
    data = serialize_array(vals)
    magic, n = struct.unpack_from("<iq", data, 0)
    assert magic == RBM_ARRAY_MAGIC
    assert n == 3  # high-32 keys 0, 1, 256
    assert deserialize_array(data).tolist() == sorted(vals)


def test_array_framing_empty_and_offset():
    from deg04_local_data_lake_spark.sources.roaring import (
        deserialize_array,
        serialize_array,
    )

    assert deserialize_array(serialize_array([])).tolist() == []
    data = b"xyz" + serialize_array([7, 9])
    assert deserialize_array(data, 3).tolist() == [7, 9]


def test_z85_spec_vector():
    """The public ZeroMQ 32/Z85 spec's reference vector — proves the
    alphabet is Z85, not Python's RFC1924 b85."""
    from deg04_local_data_lake_spark.sources.delta_log import (
        _z85_decode,
        _z85_encode,
    )

    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert _z85_encode(raw) == "HelloWorld"
    assert _z85_decode("HelloWorld") == raw


def test_z85_padding_round_trip():
    from deg04_local_data_lake_spark.sources.delta_log import (
        _z85_decode,
        _z85_encode,
    )

    for n in range(1, 10):
        raw = bytes(range(n))
        assert _z85_decode(_z85_encode(raw), n) == raw


def test_dv_rel_path_uuid_round_trip():
    import uuid as _uuid

    from deg04_local_data_lake_spark.sources.delta_log import (
        _dv_rel_path,
        _z85_encode,
    )

    u = _uuid.UUID("12345678-1234-5678-1234-567812345678")
    desc = {"pathOrInlineDv": "ab" + _z85_encode(u.bytes)}
    assert _dv_rel_path(desc) == f"ab/deletion_vector_{u}.bin"
    desc = {"pathOrInlineDv": _z85_encode(u.bytes)}
    assert _dv_rel_path(desc) == f"deletion_vector_{u}.bin"

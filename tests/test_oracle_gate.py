"""Tests for oracle.py's driver-mirror canonicalization gate.

Round 3 post-mortem: the local gate normalized list cells to tuples, so a
query emitting a raw ``array<double>`` column passed locally but crashed
the external driver's pandas ``sort_values`` canonicalization
(``TypeError: unhashable type: 'list'`` — CORRECTNESS_r03
``normalize_embeddings``). ``driver_canonical_hash`` now replays the
driver's exact pipeline; these tests pin the behaviors that closed the gap.
"""

from __future__ import annotations

import datetime

import pytest

from deg04_local_data_lake_spark.oracle import driver_canonical_hash


def test_list_cell_raises_like_the_driver():
    with pytest.raises(TypeError):
        driver_canonical_hash(["a", "vec"], [(1, [0.1, 0.2]), (2, [0.3])])


def test_scalar_rows_hash_order_insensitively():
    rows = [(2, "y"), (1, "x"), (3, None)]
    a = driver_canonical_hash(["k", "s"], rows)
    b = driver_canonical_hash(["k", "s"], list(reversed(rows)))
    assert a == b


def test_hash_detects_value_difference():
    a = driver_canonical_hash(["k"], [(1,), (2,)])
    b = driver_canonical_hash(["k"], [(1,), (3,)])
    assert a != b


def test_nan_and_datetime_normalize_deterministically():
    rows = [
        (float("nan"), datetime.datetime(2024, 1, 1, 12)),
        (1.5, datetime.datetime(2024, 1, 2, 0)),
    ]
    assert driver_canonical_hash(["v", "ts"], rows) == driver_canonical_hash(
        ["v", "ts"], [rows[1], rows[0]]
    )


def test_bytearray_cells_hash_as_bytes():
    a = driver_canonical_hash(["b"], [(bytearray(b"ab"),)])
    b = driver_canonical_hash(["b"], [(b"ab",)])
    assert a == b


def test_empty_result_hashes():
    assert driver_canonical_hash(["k", "v"], []) == driver_canonical_hash(
        ["k", "v"], []
    )

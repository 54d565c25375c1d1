"""Z-order clustering + zone-map pruning (operators/zorder.py):
Morton-key math, pruning correctness, and the two-axis skip property a
1-D sort cannot give."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.zorder import (
    build_zone_map,
    pruned_read,
    write_zordered,
    zorder_key,
)
from chainalytic_framework_spark.tables import TableStore


def test_zorder_key_interleaves_bits(spark):
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (3, 0), (0, 3), (3, 3), (2, 1)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")
    )
    got = {(r["x"], r["y"]): r["z"] for r in df.collect()}
    # z = x bits at even positions, y bits at odd positions
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(3, 3)] == 0b1111
    assert got[(2, 1)] == 0b0110  # x=10 -> pos 0,2 = 0,1; y=01 -> pos 1,3 = 1,0


@pytest.fixture(scope="module")
def grid_store(spark, tmp_path_factory):
    # 64x64 grid of (url_bucket, day), 4 rows per cell
    store = TableStore(spark, str(tmp_path_factory.mktemp("zorder")))
    df = (
        spark.range(64 * 64 * 4)
        .select(
            (F.col("id") % 64).alias("url_bucket"),
            ((F.col("id") / 64).cast("long") % 64).alias("day"),
            (F.col("id") * 31 % 997).alias("v"),
        )
    )
    write_zordered(store, df, "grid", ["url_bucket", "day"], bits=6, n_files=16)
    return store, df


def test_pruned_read_correct(grid_store):
    store, df = grid_store
    box = {"url_bucket": (5, 12), "day": (40, 47)}
    got, scanned, total = pruned_read(store, "grid", box)
    want = df.where(
        (F.col("url_bucket").between(5, 12)) & (F.col("day").between(40, 47))
    )
    assert got.count() == want.count() == 8 * 8 * 4
    assert got.exceptAll(want).isEmpty()
    assert 0 < scanned < total == 16


def test_both_axes_prune(grid_store):
    # the z-order point: EACH single-dimension box must skip files.
    # A 1-D (day-sorted) layout can never skip on url_bucket alone.
    store, _ = grid_store
    _, s_url, total = pruned_read(store, "grid", {"url_bucket": (0, 7)})
    _, s_day, _ = pruned_read(store, "grid", {"day": (0, 7)})
    assert s_url < total and s_day < total
    # 1/8th of one axis with 16 files in a 2-D curve: expect ~sqrt
    # locality, i.e. well under half the files
    assert s_url <= total // 2 and s_day <= total // 2


def test_linear_sort_cannot_prune_trailing_axis(grid_store, spark):
    # control experiment: same data sorted 1-D by (day, url_bucket) —
    # a url_bucket-only box intersects EVERY file's url range
    store, df = grid_store
    linear = df.repartitionByRange(16, "day", "url_bucket").sortWithinPartitions(
        "day", "url_bucket"
    )
    store.write(linear, "grid_linear")
    build_zone_map(store, "grid_linear", ["url_bucket", "day"])
    _, s_url, total = pruned_read(store, "grid_linear", {"url_bucket": (0, 7)})
    assert s_url == total  # no skipping on the trailing axis
    _, s_url_z, total_z = pruned_read(store, "grid", {"url_bucket": (0, 7)})
    assert s_url_z < s_url  # z-order strictly better on this axis


def test_empty_box_returns_empty(grid_store):
    store, _ = grid_store
    got, scanned, _ = pruned_read(store, "grid", {"url_bucket": (500, 600)})
    assert scanned == 0 and got.count() == 0

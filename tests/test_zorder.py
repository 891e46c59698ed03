"""Z-order clustered layout: correctness (lossless rewrite) and the
file-skipping property the layout exists for — a box predicate on the
z-ordered columns must overlap far fewer files' min/max envelopes than
the same data written hash-shuffled."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.session import load_table
from entropy_balance_weighting_spark.sources.layout import (
    write_zordered,
    zorder_key,
)
from tests.conftest import SF_SMOKE


def _files_overlapping_box(path: str, lo_u, hi_u, lo_v, hi_v):
    """Count parquet files whose footer min/max envelope intersects the
    box — the files a stats-pruning scan would have to touch."""
    hit, total = 0, 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins = {"user_id": None, "value": None}
        maxs = {"user_id": None, "value": None}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    s = col.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        total += 1
        if (
            mins["user_id"] is not None
            and maxs["user_id"] >= lo_u
            and mins["user_id"] <= hi_u
            and maxs["value"] >= lo_v
            and mins["value"] <= hi_v
        ):
            hit += 1
    return hit, total


def test_zorder_write_is_lossless_and_skips_files(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    n = ev.count()

    z_path = str(tmp_path / "z")
    h_path = str(tmp_path / "h")
    write_zordered(ev, z_path, ("user_id", "value"), n_files=16)
    # control: same file count, hash-shuffled (no locality)
    ev.repartition(16).write.mode("overwrite").parquet(h_path)

    # lossless: same rows come back
    back = spark.read.parquet(z_path)
    assert back.count() == n
    assert (
        back.select(F.sum("event_id")).first()[0]
        == ev.select(F.sum("event_id")).first()[0]
    )

    # box query touching ~1/16 of each dimension's range
    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    u_span = stats[1] - stats[0]
    v_span = stats[3] - stats[2]
    lo_u, hi_u = stats[0], stats[0] + u_span / 16
    lo_v, hi_v = stats[2], stats[2] + v_span / 16

    z_hit, z_total = _files_overlapping_box(z_path, lo_u, hi_u, lo_v, hi_v)
    h_hit, h_total = _files_overlapping_box(h_path, lo_u, hi_u, lo_v, hi_v)
    assert z_total >= 8 and h_total >= 8
    # hash layout: every file spans the whole space -> no skipping
    assert h_hit == h_total
    # z-order: the box lives in a few curve segments
    assert z_hit < z_total / 2

    # and the filtered read agrees with the in-memory filter
    pred = (
        (F.col("user_id") >= lo_u) & (F.col("user_id") <= hi_u)
        & (F.col("value") >= lo_v) & (F.col("value") <= hi_v)
    )
    assert back.filter(pred).count() == ev.filter(pred).count()


def test_zorder_key_interleaves(spark):
    """Adjacent keys differ in low-order bits of BOTH dimensions: the
    key of (bin u, bin v) is the bit-interleave, so points equal in one
    dimension and close in the other get close keys, and the constant
    column degenerates gracefully."""
    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(100)], "a long, v double"
    )
    key = zorder_key(df, ("a", "v"), bits=4)
    rows = df.withColumn("k", key).collect()
    assert len({r.k for r in rows}) > 1
    const = spark.createDataFrame([(1, 5.0), (2, 5.0)], "a long, v double")
    kc = const.withColumn("k", zorder_key(const, ("v",), bits=4)).collect()
    assert {r.k for r in kc} == {0}


def test_zorder_footer_stats_edges_no_spark_job(spark, tmp_path):
    """The stats path: edges from parquet footers (no Spark min/max job),
    and the rewrite stays lossless with equivalent clustering."""
    from entropy_balance_weighting_spark.sources.layout import parquet_column_edges

    src = str(tmp_path / "src")
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    ev.write.mode("overwrite").parquet(src)

    edges = parquet_column_edges(src, ("user_id", "value"))
    agg = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    assert edges["user_id"] == (float(agg[0]), float(agg[1]))
    assert edges["value"] == (float(agg[2]), float(agg[3]))

    # no Spark job may run while building the key from given edges
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    key = zorder_key(ev, ("user_id", "value"), edges=edges)
    assert tracker.getJobIdsForGroup(None) == before

    z_path = str(tmp_path / "z2")
    write_zordered(
        spark.read.parquet(src), z_path, ("user_id", "value"), stats_path=src
    )
    assert spark.read.parquet(z_path).count() == ev.count()
    assert key is not None


def test_zorder_bits_autoshrink():
    """len(cols)*bits must stay <= 63 or Java's mod-64 shifts scramble
    the curve; bits auto-shrink, and an impossible key raises."""
    import pytest

    from entropy_balance_weighting_spark.sources.layout import zorder_key

    edges = {f"c{i}": (0.0, 1.0) for i in range(7)}
    cols = tuple(edges)
    # bits=10 with 7 cols would shift to bit 69; the shrunk key must not
    # reference shifts >= 63.  Build against a dummy df-free column expr:
    # zorder_key needs a DataFrame only for the agg path, edges skips it.
    key = zorder_key(None, cols, bits=10, edges=edges)
    assert "69" not in str(key._jc.toString()) if hasattr(key, "_jc") else True

    with pytest.raises(ValueError, match="too many"):
        zorder_key(None, tuple(f"c{i}" for i in range(64)), bits=10,
                   edges={f"c{i}": (0.0, 1.0) for i in range(64)})


def test_zorder_key_int_matches_direct_arithmetic(spark):
    """zorder_key_int must be pure integer arithmetic: bin =
    ((x−mn)·2^bits) div span, interleaved bit i of col j at key bit
    i·m+j — recomputed here in Python ints and compared row for row
    (the engine-replayability contract the s15 oracle relies on)."""
    from entropy_balance_weighting_spark.sources.layout import (
        zorder_key_int,
    )

    rows = [(i, (i * 37) % 101, (i * 91) % 53) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    edges = {"a": (0.0, 100.0), "b": (0.0, 52.0)}
    got = {
        r["id"]: r["k"]
        for r in df.withColumn(
            "k", zorder_key_int(df, ("a", "b"), bits=4, edges=edges)
        ).collect()
    }
    n_bins = 16
    for i, a, b in rows:
        ba = min(max((a - 0) * n_bins // 101, 0), n_bins - 1)
        bb = min(max((b - 0) * n_bins // 53, 0), n_bins - 1)
        want = 0
        for bit in range(4):
            want |= ((ba >> bit) & 1) << (2 * bit)
            want |= ((bb >> bit) & 1) << (2 * bit + 1)
        assert got[i] == want, (i, a, b, got[i], want)


def test_parquet_file_stats_per_file_envelopes(spark, tmp_path):
    """parquet_file_stats returns one row per physical file with
    row-group-merged min/max — checked against the data itself after a
    hive-partitioned write."""
    from entropy_balance_weighting_spark.sources.layout import (
        parquet_file_stats,
        write_partitioned,
    )

    df = spark.createDataFrame(
        [(i, i % 3, i * 2) for i in range(90)], "v long, part int, w long"
    )
    path = str(tmp_path / "pf")
    write_partitioned(df, path, ("part",))
    stats = parquet_file_stats(path, ("v", "w"))
    assert len(stats) == 3
    by_part = {}
    for fpath, n_rows, st in stats:
        import re

        p = int(re.search(r"part=(\d+)", fpath).group(1))
        by_part[p] = (n_rows, st)
    for p in range(3):
        vals = [i for i in range(90) if i % 3 == p]
        n_rows, st = by_part[p]
        assert n_rows == len(vals)
        assert st["v"] == (min(vals), max(vals))
        assert st["w"] == (2 * min(vals), 2 * max(vals))

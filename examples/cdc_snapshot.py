"""CDC → snapshot example: the same changelog compacted BATCH and
STREAMING, converging on the identical snapshot.

Run:  python examples/cdc_snapshot.py [sf_dir]

The ``events`` table plays the changelog: key = ``user_id``, version =
``(ts, event_id)``, tombstone = an ``'error'`` last record.

1. batch: :func:`functions.events.compact_changelog` — latest-per-key
   via ``max_by(row_struct, version_struct)``, a partial-merge
   aggregate (each task pre-compacts; the exchange carries one
   candidate per task×key, never the log);
2. streaming: :func:`streaming.streaming_cdc_compact` — one state
   tuple per key in the state store, fed the SAME records as two
   micro-batches in shuffled order (version ordering, not arrival
   order, decides);
3. the two snapshots are compared row for row, then tombstones drop.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from pyspark.sql import functions as F

    from entropy_balance_weighting_spark.functions.events import (
        compact_changelog,
    )
    from entropy_balance_weighting_spark.session import get_spark, load_table
    from entropy_balance_weighting_spark.streaming import (
        streaming_cdc_compact,
    )

    spark = get_spark(app_name="cdc_snapshot_example")
    ev = load_table(spark, sf_dir, "events")

    # 1. batch compaction + tombstone filter
    snap = compact_changelog(ev, keys=("user_id",), version=("ts", "event_id"))
    live = snap.filter(F.col("event_type") != "error")
    n_changes = ev.count()
    n_keys = snap.count()
    n_live = live.count()
    print(
        f"changelog: {n_changes} records -> {n_keys} keys "
        f"({n_keys - n_live} tombstoned, {n_live} live)"
    )

    # 2. the same records streamed as two shuffled micro-batches
    with tempfile.TemporaryDirectory() as tmp:
        src = Path(tmp) / "src"
        src.mkdir()
        ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            streaming_cdc_compact(stream)
            .writeStream.format("memory")
            .queryName("cdc_example")
            .outputMode("update")
            .option("checkpointLocation", str(Path(tmp) / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        emitted = spark.sql("SELECT * FROM cdc_example")
        # final state per key = the emission with the highest n_changes
        from pyspark.sql import Window

        w = Window.partitionBy("key").orderBy(F.col("n_changes").desc())
        final = (
            emitted.withColumn("rk", F.row_number().over(w))
            .filter("rk = 1")
            .select(
                F.col("key").alias("user_id"),
                F.col("last_type").alias("event_type"),
                F.round("last_value", 9).alias("value"),
                "n_changes",
            )
        )
        batch_cmp = snap.select(
            "user_id", "event_type", F.round("value", 9).alias("value"),
            "n_changes",
        )
        diff = final.exceptAll(batch_cmp).count() + batch_cmp.exceptAll(
            final
        ).count()
        print(f"streaming snapshot == batch snapshot: {diff == 0}")
        assert diff == 0

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])

"""Spike: WARC ingest throughput — the number the 100 TB story needs.

A Common Crawl snapshot is ~100k gzip member-per-record WARC files of
~1 GB each.  read_warc is binaryFile → mapInPandas with one task per
file, so cluster ingest rate = per-task MB/s × executor slots.  This
spike measures the per-task rate end-to-end (gzip member split +
record parse + HTTP body split/decode + Arrow batching) on files big
enough to amortize task launch, and writes bench_warc_r10.json.

Run:  python spikes/warc_throughput.py [n_files] [mb_per_file]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from entropy_balance_weighting_spark.session import get_spark
from entropy_balance_weighting_spark.sources import warc


def build_files(
    dest: str, n_files: int, mb_per_file: int, body_words: int = 1200
) -> dict:
    """Deterministic member-per-record .warc.gz files with ~6·body_words
    byte bodies, until the target raw size per file.  Small records
    stress the member walk; large records stress the byte path — the
    artifact reports both."""
    os.makedirs(dest, exist_ok=True)
    words = ("the quick crawl record body text with some repeated tokens "
             "and markup <p>paragraph</p> ").split()
    total_raw = 0
    n_records = 0
    for f in range(n_files):
        chunks = []
        raw = 0
        i = 0
        target = mb_per_file * (1 << 20)
        while raw < target:
            body = (
                " ".join(
                    words[(i + j) % len(words)] for j in range(body_words)
                )
            ).encode()
            rec = warc.build_warc_record(
                "response",
                record_id=f"f{f}-r{i}",
                date="2026-01-01T00:00:00Z",
                target_uri=f"http://host{f}.example.com/p{i}",
                content=warc.build_http_response(body),
                content_type="application/http; msgtype=response",
            )
            raw += len(rec)
            chunks.append(warc.gzip_member(rec))
            i += 1
        data = b"".join(chunks)
        with open(os.path.join(dest, f"part-{f:03d}.warc.gz"), "wb") as fh:
            fh.write(data)
        total_raw += raw
        n_records += i
    gz_bytes = sum(
        os.path.getsize(os.path.join(dest, p)) for p in os.listdir(dest)
    )
    return {"raw_bytes": total_raw, "gz_bytes": gz_bytes,
            "n_records": n_records}


def _measure(spark, dest: str, stats: dict) -> dict:
    t0 = time.time()
    agg = (
        warc.read_warc(spark, dest, glob="*.warc.gz")
        .filter(F.col("warc_type") == "response")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("body_bytes"),
            F.sum(
                F.when(F.col("http_status") == 200, 1).otherwise(0)
            ).alias("n_200"),
        )
        .first()
    )
    wall = time.time() - t0
    assert agg["n"] == stats["n_records"], (agg["n"], stats)
    return {
        "n_records": stats["n_records"],
        "raw_mb": round(stats["raw_bytes"] / 2**20, 1),
        "scan_s": round(wall, 3),
        "raw_mb_s": round(stats["raw_bytes"] / 2**20 / wall, 1),
        "records_s": round(stats["n_records"] / wall, 1),
    }


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mb_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    dest = os.path.join(os.path.dirname(__file__), "..", ".scratch",
                        "warc_spike")
    spark = get_spark(app_name="warc_spike")
    try:
        out = {"metric": "warc_ingest_throughput", "n_files": n_files,
               "configs": {}}
        for label, body_words in (("rec_8kb", 1200), ("rec_64kb", 9600)):
            shutil.rmtree(dest, ignore_errors=True)
            stats = build_files(dest, n_files, mb_per_file, body_words)
            # warm pass (JVM + page cache), then the measured pass
            _measure(spark, dest, stats)
            out["configs"][label] = _measure(spark, dest, stats)
        out["loadavg"] = list(os.getloadavg())
        per_task = out["configs"]["rec_64kb"]["raw_mb_s"] / n_files
        out["note"] = (
            "local[32], one task per file; cluster ingest = raw_mb_s x "
            "(slots / files in flight).  At the 64 KB-record rate a "
            f"1 GB CC file costs ~{round(1024 / per_task)}s/task; "
            "records/s (not bytes) binds at small record sizes."
        )
        print(json.dumps(out))
        root = Path(__file__).resolve().parents[1]
        (root / "bench_warc_r10.json").write_text(json.dumps(out) + "\n")
    finally:
        spark.stop()
        shutil.rmtree(dest, ignore_errors=True)


if __name__ == "__main__":
    main()

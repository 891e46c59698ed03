"""Token-shard training-export sink (sources/shards.py): deterministic
bytes, manifest parity, dtype-range guards."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from entropy_balance_weighting_spark.functions.packing import shard_of
from entropy_balance_weighting_spark.sources import (
    read_token_shard,
    write_token_shards,
)


def _docs(spark, n=40, vocab=1000):
    rows = [
        (i, [int((i * 31 + j * 7) % vocab) + 1 for j in range(3 + i % 9)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>"), rows


def test_shard_roundtrip_bytes_and_manifest(spark, tmp_path):
    """Every doc lands in its salt-hash shard sorted by id, EOS-joined;
    the manifest's counts and CRC match the bytes on disk exactly."""
    df, rows = _docs(spark)
    dest = str(tmp_path / "shards")
    man = {
        r["shard"]: r
        for r in write_token_shards(
            df, dest, n_shards=4, dtype="uint16", eos_id=0
        ).collect()
    }
    # recompute expected shard contents driver-side with the same hash
    asg = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", shard_of("doc_id", 4, "tok").alias("s")
        ).collect()
    }
    by_shard: dict[int, list[int]] = {}
    for did, toks in sorted(rows):
        by_shard.setdefault(asg[did], []).extend(toks + [0])
    assert set(man) == set(by_shard)
    for s, want in by_shard.items():
        got = read_token_shard(f"{dest}/shard-{s:05d}.bin", dtype="uint16")
        np.testing.assert_array_equal(got, np.asarray(want, dtype=np.uint16))
        m = man[s]
        assert m["n_tokens"] == len(want)
        assert m["n_bytes"] == 2 * len(want)
        assert m["crc32"] == zlib.crc32(got.astype("<u2").tobytes())
        assert m["n_docs"] == sum(1 for d in asg if asg[d] == s)


def test_shard_bytes_deterministic(spark, tmp_path):
    """Same input → byte-identical shards across runs (resumable,
    auditable exports)."""
    df, _ = _docs(spark, n=25)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_token_shards(df, a, n_shards=3).collect()
    write_token_shards(df, b, n_shards=3).collect()
    for s in range(3):
        pa, pb = f"{a}/shard-{s:05d}.bin", f"{b}/shard-{s:05d}.bin"
        np.testing.assert_array_equal(
            read_token_shard(pa), read_token_shard(pb)
        )


def test_shard_uint32_and_range_guard(spark, tmp_path):
    big = spark.createDataFrame(
        [(1, [70000, 5]), (2, [3])], "doc_id long, tokens array<int>"
    )
    man = write_token_shards(
        big, str(tmp_path / "u32"), n_shards=1, dtype="uint32", eos_id=1
    ).collect()
    assert man[0]["n_tokens"] == 5  # 2 + eos + 1 + eos
    got = read_token_shard(str(tmp_path / "u32" / "shard-00000.bin"),
                           dtype="uint32")
    assert 70000 in got.tolist()
    with pytest.raises(Exception, match="out of uint16 range"):
        write_token_shards(
            big, str(tmp_path / "u16"), n_shards=1, dtype="uint16"
        ).collect()
    with pytest.raises(ValueError, match="dtype must be"):
        write_token_shards(big, str(tmp_path / "x"), dtype="float32")


def test_shard_reexport_clears_stale_shards(spark, tmp_path):
    """Re-exporting into the same dest with fewer shards must not leave
    stale shard files the new manifest doesn't cover — a consumer
    globbing dest/*.bin would read a corrupt export."""
    import glob

    df, _ = _docs(spark, n=30)
    dest = str(tmp_path / "re")
    man8 = write_token_shards(df, dest, n_shards=8).collect()
    assert len(glob.glob(f"{dest}/shard-*.bin")) == len(man8) > 2
    man = write_token_shards(df, dest, n_shards=2).collect()
    files = sorted(glob.glob(f"{dest}/shard-*.bin"))
    assert len(files) == len(man) == 2
    assert {f"{dest}/shard-{r['shard']:05d}.bin" for r in man} == set(files)


def test_shard_export_failure_preserves_previous_export(spark, tmp_path):
    """A failed export (token id out of dtype range) must leave the
    previous good export untouched: same files, same bytes — the swap
    to final names happens only after the job succeeds."""
    import glob
    import os

    df, _ = _docs(spark, n=20)
    dest = str(tmp_path / "safe")
    write_token_shards(df, dest, n_shards=3).collect()
    before = {
        p: open(p, "rb").read() for p in glob.glob(f"{dest}/shard-*.bin")
    }
    assert len(before) >= 2
    bad = spark.createDataFrame(
        [(1, [70000])], "doc_id long, tokens array<int>"
    )
    import pytest as _pt

    with _pt.raises(Exception):
        write_token_shards(bad, dest, n_shards=3, dtype="uint16")
    after = {
        p: open(p, "rb").read() for p in glob.glob(f"{dest}/shard-*.bin")
    }
    assert after == before
    # a later successful export clears any stray temps
    write_token_shards(df, dest, n_shards=2).collect()
    assert glob.glob(f"{dest}/shard-*.bin.tmp") == []
    assert len(glob.glob(f"{dest}/shard-*.bin")) == 2


def test_read_token_shards_roundtrip_and_truncation(spark, tmp_path):
    """Distributed reader: write -> read recovers every document's ids
    (as a multiset of token lists - the layout stores positions, not
    ids), and a truncated shard tail surfaces as a truncated=true row
    instead of vanishing."""
    from entropy_balance_weighting_spark.sources.shards import (
        read_token_shards,
        write_token_shards,
    )

    docs = [(i, [int(x) for x in range(1, 2 + i % 5)]) for i in range(23)]
    df = spark.createDataFrame(docs, "doc_id long, tokens array<int>")
    dest = str(tmp_path / "shards")
    write_token_shards(df, dest, n_shards=4, dtype="uint16", eos_id=0)

    back = read_token_shards(spark, dest, dtype="uint16", eos_id=0)
    rows = back.collect()
    assert all(not r["truncated"] for r in rows)
    got = sorted(tuple(r["tokens"]) for r in rows)
    want = sorted(tuple(t) for _, t in docs)
    assert got == want
    # doc_idx is dense per shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["doc_idx"])
    for shard, idxs in by_shard.items():
        assert sorted(idxs) == list(range(len(idxs))), shard

    # truncate one shard mid-document: the tail becomes a flagged row
    import glob as _g
    import os as _os

    victim = sorted(_g.glob(_os.path.join(dest, "shard-*.bin")))[0]
    data = open(victim, "rb").read()
    open(victim, "wb").write(data[:-2] + b"\x07\x00")  # last id, no EOS
    back2 = read_token_shards(spark, dest).collect()
    trunc = [r for r in back2 if r["truncated"]]
    assert len(trunc) == 1
    assert trunc[0]["tokens"][-1] == 7
    assert len(back2) == len(rows)  # same row count: tail kept as a doc

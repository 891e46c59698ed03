"""Training-export token-shard sink — the final hop of an LLM data
pipeline: tokenized documents leave the lakehouse as fixed-dtype binary
shards (the Megatron/GPT ``.bin`` convention: token ids concatenated
document-after-document with an EOS separator) plus a relational
manifest (shard → doc/token/byte counts + CRC) that makes the export
auditable and resumable.

Scale design (the 100 TB lens):

- **One shuffle.**  Documents hash to shards via the engine-portable
  salt hash (:func:`functions.packing.shard_of` — deterministic across
  runs and engines), and ``groupBy(shard).applyInPandas`` is a single
  exchange; each shard is assembled and written by exactly one task, so
  shard bytes are deterministic (docs sorted by id within the shard) and
  no coordination or rename-commit dance is needed.
- **Shard size is the memory unit.**  A shard must fit one executor's
  Arrow frame; size ``n_shards`` so tokens-per-shard stays in the
  hundreds of millions (≈2 GB uint16), the same granularity training
  loaders want.  For larger corpora raise ``n_shards`` — the plan is
  unchanged.
- **Executor-local writes.**  Tasks write ``shard-NNNNN.bin`` files
  directly (local-FS path here; production swaps ``open`` for the
  distributed-FS client — same partitioning, same manifest).  The
  returned manifest is data, not a side effect: join it against
  expected counts as the export's acceptance test.

Reference parity note: the reference engine (/root/reference) has no
export surface; this is §7.5 extension surface.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from entropy_balance_weighting_spark.functions.packing import shard_of

_DTYPES = {"uint16": np.uint16, "uint32": np.uint32}


def write_token_shards(
    df: DataFrame,
    dest: str,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_shards: int = 8,
    dtype: str = "uint16",
    eos_id: int = 0,
    salt: str = "tok",
) -> DataFrame:
    """Write ``tokens_col`` (``array<int>`` token ids) as ``n_shards``
    binary shard files under ``dest`` and return the manifest DataFrame
    ``(shard, n_docs, n_tokens, n_bytes, crc32)`` (one row per
    non-empty shard; collect/write it as the export record).

    Layout per shard: documents sorted by ``id_col``, each document's
    ids followed by one ``eos_id``, all stored little-endian ``dtype``.
    Ids outside the dtype's range raise a named ValueError rather than
    silently wrapping (a uint16 export of a 100k-vocab corpus is a
    bug, not a cast).

    Crash safety: tasks write ``shard-NNNNN.bin.tmp`` files; only after
    the export job completes does the driver delete the PREVIOUS
    export's ``shard-*.bin`` files and rename the temps into place —
    a failed or interrupted export leaves the prior good export intact
    (at worst with stray ``.tmp`` files, which the next successful run
    clears).  The write is therefore eager: this function runs the
    Spark job before returning, and the returned manifest DataFrame is
    built from the collected rows (tiny: one row per non-empty shard).
    """
    import glob
    import os
    import zlib

    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be one of {sorted(_DTYPES)}, got {dtype!r}")
    np_dtype = _DTYPES[dtype]
    limit = int(np.iinfo(np_dtype).max)
    if not 0 <= eos_id <= limit:
        raise ValueError(f"eos_id {eos_id} out of range for {dtype}")
    os.makedirs(dest, exist_ok=True)
    # Clear temps from any previously-failed export so a stale .tmp
    # can't be swapped in alongside this run's output.
    for old in glob.glob(os.path.join(dest, "shard-*.bin.tmp")):
        os.remove(old)

    d = df.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).alias("toks"),
        shard_of(id_col, n_shards, salt).alias("shard"),
    )

    def write_shard(pdf):
        import pandas as pd

        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values("id")
        parts = []
        for toks in pdf["toks"]:
            a = np.asarray(toks, dtype=np.int64)
            if a.size and (a.min() < 0 or a.max() > limit):
                raise ValueError(
                    f"token id out of {dtype} range in shard {shard}: "
                    f"[{a.min()}, {a.max()}]"
                )
            parts.append(a)
            parts.append(np.array([eos_id], dtype=np.int64))
        flat = (
            np.concatenate(parts).astype("<" + np.dtype(np_dtype).str[1:])
            if parts
            else np.empty(0, dtype=np_dtype)
        )
        data = flat.tobytes()
        path = os.path.join(dest, f"shard-{shard:05d}.bin.tmp")
        with open(path, "wb") as f:
            f.write(data)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_docs": [len(pdf)],
                "n_tokens": [int(flat.size)],
                "n_bytes": [len(data)],
                "crc32": [zlib.crc32(data)],
            }
        )

    schema = "shard int, n_docs long, n_tokens long, n_bytes long, crc32 long"
    rows = d.groupBy("shard").applyInPandas(write_shard, schema).collect()
    # Job succeeded: swap temps in, THEN drop stale shards the new
    # manifest doesn't cover (a re-export with fewer non-empty shards
    # must not leave old .bin files a consumer globbing dest/*.bin
    # would read as part of this export).
    new_names = set()
    for tmp in sorted(glob.glob(os.path.join(dest, "shard-*.bin.tmp"))):
        final = tmp[: -len(".tmp")]
        os.replace(tmp, final)
        new_names.add(os.path.basename(final))
    for old in glob.glob(os.path.join(dest, "shard-*.bin")):
        if os.path.basename(old) not in new_names:
            os.remove(old)
    return df.sparkSession.createDataFrame(rows, schema)


def read_token_shard(path: str, *, dtype: str = "uint16") -> np.ndarray:
    """Load one shard file back as a token-id array (test/audit helper;
    training loaders memory-map the same layout)."""
    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be one of {sorted(_DTYPES)}, got {dtype!r}")
    return np.fromfile(path, dtype="<" + np.dtype(_DTYPES[dtype]).str[1:])


def read_token_shards(
    spark,
    src: str,
    *,
    dtype: str = "uint16",
    eos_id: int = 0,
) -> DataFrame:
    """Distributed reader for a token-shard export: ``binaryFile`` scan
    over ``shard-*.bin`` → one Arrow map stage splitting each shard on
    ``eos_id`` → ``(shard, doc_idx, tokens array<long>, n_tokens)``, one
    row per document (``doc_idx`` is the document's position within its
    shard — the layout stores no ids; positions are deterministic
    because the writer sorts by id within each shard).

    This is the training loader's view of the export, distributed: one
    task per shard file (the same unit the writer produced), no
    shuffle, so a verification pass over a full export is a map-only
    job.  Trailing partial documents (no final EOS — a truncated file)
    surface as a row with ``truncated=true`` rather than vanishing:
    corruption is queryable, same discipline as the WARC reader.
    Token ids widen to int64 on read — a uint32 id ≥ 2³¹ must round-
    trip exactly (the writer raises on out-of-dtype ids precisely so
    no silent wrap exists anywhere on this path)."""
    import pandas as pd

    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be one of {sorted(_DTYPES)}, got {dtype!r}")
    np_dtype = "<" + np.dtype(_DTYPES[dtype]).str[1:]

    def gen(batches):
        for pdf in batches:
            for path, data in zip(pdf["path"], pdf["content"]):
                name = path.rsplit("/", 1)[-1]
                try:
                    shard = int(name.split("-")[1].split(".")[0])
                except (IndexError, ValueError):
                    shard = -1
                ids = np.frombuffer(bytes(data), dtype=np_dtype)
                rows = []
                start = 0
                doc_idx = 0
                ends = np.nonzero(ids == eos_id)[0]
                for e in ends:
                    rows.append(
                        {
                            "shard": shard,
                            "doc_idx": doc_idx,
                            "tokens": ids[start:e].astype("int64"),
                            "n_tokens": int(e - start),
                            "truncated": False,
                        }
                    )
                    doc_idx += 1
                    start = int(e) + 1
                if start < len(ids):  # tail with no EOS: truncation
                    rows.append(
                        {
                            "shard": shard,
                            "doc_idx": doc_idx,
                            "tokens": ids[start:].astype("int64"),
                            "n_tokens": int(len(ids) - start),
                            "truncated": True,
                        }
                    )
                if rows:
                    yield pd.DataFrame(rows)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard-*.bin")
        .load(src)
        .select("path", "content")
    )
    return files.mapInPandas(
        gen,
        "shard int, doc_idx int, tokens array<long>, n_tokens int, "
        "truncated boolean",
    )

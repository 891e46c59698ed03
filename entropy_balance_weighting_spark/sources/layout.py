"""Storage-layout management: partitioned and bucketed parquet sinks.

At 100 TB the table LAYOUT is the query plan's first operator:

- **Hive-partitioned** writes (``partitionBy``) give partition PRUNING —
  a filter on the partition column skips whole directories at file-listing
  time (visible as ``PartitionFilters`` in the scan node, before any I/O).
- **Bucketed** writes (``bucketBy`` + ``saveAsTable``) pre-shuffle a table
  ONCE by its join/agg key; any later equi-join or groupBy on that key
  between same-bucketed tables runs with ZERO exchange — the shuffle is
  amortized across every downstream query.
- The ``repartition(partition_cols)`` before a partitioned write bounds
  the small-file explosion: without it every task writes a file into
  every partition directory (tasks × partitions files); with it each
  partition's rows land in one task (plus AQE coalescing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parquet_column_edges(
    path: str, cols: tuple[str, ...]
) -> dict[str, tuple[float, float]]:
    """(min, max) per column from parquet FOOTER statistics — metadata
    reads only, zero Spark jobs, zero data I/O.  This is the "table
    stats" path for :func:`zorder_key` edges: at 100 TB a full min/max
    aggregate pass doubles the I/O of a re-layout sink, while footers
    are a few KB per file and already row-group-exact."""
    import pyarrow.dataset as ds

    lo: dict[str, float] = {}
    hi: dict[str, float] = {}
    dataset = ds.dataset(path, format="parquet")
    for frag in dataset.get_fragments():
        md = frag.metadata
        schema_names = {md.schema.column(i).path: i for i in range(md.num_columns)}
        for c in cols:
            if c not in schema_names:
                raise ValueError(
                    f"column {c!r} not in parquet schema; footer has "
                    f"{sorted(schema_names)}"
                )
            i = schema_names[c]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                if st is None or not st.has_min_max:
                    raise ValueError(
                        f"parquet footer lacks min/max stats for column {c!r}"
                    )
                try:
                    mn, mx = float(st.min), float(st.max)
                except (TypeError, ValueError):
                    raise ValueError(
                        f"column {c!r} has non-numeric footer statistics "
                        f"({type(st.min).__name__}); z-order edges need "
                        "numeric columns"
                    ) from None
                lo[c] = mn if c not in lo else min(lo[c], mn)
                hi[c] = mx if c not in hi else max(hi[c], mx)
    if set(lo) != set(cols):
        raise ValueError(f"no row groups found for columns {cols}")
    return {c: (lo[c], hi[c]) for c in cols}


def zorder_key(
    df: DataFrame,
    cols: tuple[str, ...],
    *,
    bits: int = 10,
    edges: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton (Z-order) curve key over ``cols``: each column is binned to
    ``2^bits`` levels between its min and max, and the bin bits are
    INTERLEAVED into one long — points close on the key are close in
    EVERY listed dimension at once, which a lexicographic multi-column
    sort cannot do (it clusters only the leading column).

    Bin edges come from ``edges`` when given (use
    :func:`parquet_column_edges` to pull them from parquet footer stats
    with no Spark job — the right call at 100 TB); otherwise one min/max
    aggregate job runs here.  Values outside the given edges clamp into
    the boundary bins, so approximate edges degrade clustering quality
    only, never correctness.  The key itself is a pure JVM expression
    tree (``width_bucket`` + shift/mask), whole-stage-codegen friendly,
    no UDF.  Linear binning is deliberate: equi-depth bins would need
    per-column quantiles, and for file skipping the curve only has to
    correlate the columns' locality, not balance the bins.
    """
    # Java shiftleft takes the shift amount mod 64, so interleave bits at
    # position >= 63 would silently wrap into low positions and scramble
    # the curve; shrink bits so every shift stays in range.
    bits = min(bits, 63 // len(cols))
    if bits < 1:
        raise ValueError(f"too many z-order columns ({len(cols)}) for a 64-bit key")
    if edges is None:
        row = df.agg(
            *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
        ).first()
        edges = {c: (float(row[f"mn_{c}"]), float(row[f"mx_{c}"])) for c in cols}
    n_bins = 1 << bits
    bin_cols = []
    for c in cols:
        mn, mx = edges[c]
        if mx <= mn:  # constant column: every row in bin 0
            bin_cols.append(F.lit(0).cast("long"))
            continue
        b = F.width_bucket(
            F.col(c).cast("double"), F.lit(mn), F.lit(mx), F.lit(n_bins)
        )
        # width_bucket is 1-based and returns n_bins+1 at the max edge
        bin_cols.append(
            F.least(F.greatest(b - 1, F.lit(0)), F.lit(n_bins - 1)).cast("long")
        )
    m = len(bin_cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, bc in enumerate(bin_cols):
            bit = F.shiftright(bc, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * m + j))
    return key


def zorder_key_int(
    df: DataFrame,
    cols: tuple[str, ...],
    *,
    bits: int = 8,
    edges: dict[str, tuple[float, float]],
) -> Column:
    """ENGINE-REPLAYABLE Morton key for INTEGER columns — the
    deterministic sibling of :func:`zorder_key`: bins are pure int64
    arithmetic, ``bin = ((x − mn) · 2^bits) div (mx − mn + 1)``, so any
    engine (Spark, DuckDB, a validation notebook) recomputes the exact
    same key bit-for-bit, where the float ``width_bucket`` path can
    flip a boundary bin by one ULP between engines.  ``edges`` is
    required (use :func:`parquet_column_edges` — footer metadata, no
    Spark job) and is truncated to ints; values outside the edges clamp
    into the boundary bins.  Same interleave layout as
    :func:`zorder_key`: bit ``i`` of column ``j`` lands at key bit
    ``i·len(cols)+j``."""
    bits = min(bits, 63 // len(cols))
    if bits < 1:
        raise ValueError(f"too many z-order columns ({len(cols)}) for a 64-bit key")
    n_bins = 1 << bits
    bin_cols = []
    for c in cols:
        mn, mx = int(edges[c][0]), int(edges[c][1])
        span = mx - mn + 1
        if span <= 1:
            bin_cols.append(F.lit(0).cast("long"))
            continue
        # SQL `div` keeps the quotient in integer arithmetic end-to-end
        # (float `/` + floor can round up one ULP at large magnitudes)
        b = F.expr(
            f"((CAST(`{c}` AS BIGINT) - CAST({mn} AS BIGINT)) * {n_bins}) "
            f"div CAST({span} AS BIGINT)"
        )
        bin_cols.append(
            F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1)).cast("long")
        )
    m = len(bin_cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, bc in enumerate(bin_cols):
            bit = F.shiftright(bc, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * m + j))
    return key


def parquet_file_stats(
    path: str, cols: tuple[str, ...]
) -> list[tuple[str, int, dict[str, tuple]]]:
    """Per-FILE parquet footer statistics: ``[(file_path, num_rows,
    {col: (min, max)}), ...]`` — the metadata table a file-skipping
    decision consumes, read driver-side with zero Spark jobs (footers
    are a few KB per file; this is the same metadata a table format's
    stats index stores).  Raises on missing min/max like
    :func:`parquet_column_edges`."""
    import pyarrow.dataset as ds

    out: list[tuple[str, int, dict[str, tuple]]] = []
    dataset = ds.dataset(path, format="parquet", partitioning="hive")
    for frag in dataset.get_fragments():
        md = frag.metadata
        names = {md.schema.column(i).path: i for i in range(md.num_columns)}
        stats: dict[str, tuple] = {}
        for c in cols:
            if c not in names:
                raise ValueError(
                    f"column {c!r} not in parquet schema; footer has "
                    f"{sorted(names)}"
                )
            i = names[c]
            mn = mx = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                if st is None or not st.has_min_max:
                    raise ValueError(
                        f"parquet footer lacks min/max stats for column {c!r}"
                    )
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            stats[c] = (mn, mx)
        out.append((frag.path, md.num_rows, stats))
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    *,
    bits: int = 10,
    n_files: int = 16,
    mode: str = "overwrite",
    edges: dict[str, tuple[float, float]] | None = None,
    stats_path: str | None = None,
) -> None:
    """Z-order-clustered parquet write (the OPTIMIZE ZORDER layout):
    range-repartition by the Morton key so each output file holds one
    contiguous curve segment, giving every file a TIGHT min/max envelope
    in all ``cols`` simultaneously.  A later scan filtering on any
    combination of those columns skips whole files/row-groups on parquet
    footer stats — at 100 TB this is the difference between touching a
    handful of files and listing-scanning the table for multi-dimension
    point/box queries that partition keys can't serve.

    Bin edges: pass ``edges`` directly, or ``stats_path`` (the parquet
    source being re-laid-out) to take them from footer statistics with
    no extra Spark job — otherwise a full min/max aggregate pass runs
    first, doubling the sink's read I/O."""
    if edges is None and stats_path is not None:
        edges = parquet_column_edges(stats_path, cols)
    key = zorder_key(df, cols, bits=bits, edges=edges)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...],
    *,
    mode: str = "overwrite",
    coalesce_per_partition: bool = True,
) -> None:
    """Hive-style partitioned parquet write with small-file control."""
    out = df.repartition(*partition_by) if coalesce_per_partition else df
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    bucket_by: str,
    sort_by: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed parquet table (catalog-registered — bucketing metadata
    lives in the table catalog, not the files).  Join/groupBy on
    ``bucket_by`` between tables bucketed the same way is exchange-free;
    ``sort_by`` additionally removes the sort from sort-merge joins.
    ``path`` makes it an EXTERNAL table (data at ``path``, metadata in
    the catalog) — without it the files land under the session's
    warehouse dir.  An existing table is dropped first so a changed
    ``path``/bucket spec never collides with stale catalog metadata."""
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, bucket_by)
    if sort_by is not None:
        w = w.sortBy(sort_by)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def compact_parquet(
    spark,
    src: str,
    dest: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> int:
    """Small-file compaction (the OPTIMIZE/bin-packing maintenance op):
    rewrite a parquet dataset into ~``target_file_bytes`` files.  A
    streaming/micro-batch sink accretes thousands of KB-sized files;
    every later scan then pays per-file open/footer/listing cost that
    dwarfs the data read — at 100 TB, file count is a first-order query
    cost and compaction is routine table maintenance.

    The output file count comes from the SOURCE BYTES via file listing
    (driver metadata only — no Spark job before the rewrite); the
    rewrite itself is one job: plain ``repartition(n)`` (full balance),
    or ``repartitionByRange(sort_by)`` + within-file sort when sort
    columns are given — which also restores footer min/max locality on
    those columns (the 1-D special case of :func:`write_zordered`).

    Writes to ``dest`` (swap-after-write is the caller's transaction
    boundary — same discipline as every table-format OPTIMIZE).
    Returns the target file count."""
    import glob as _glob
    import os as _os

    total = sum(
        _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(src, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src)
    if sort_by:
        out = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_files)
    out.write.mode(mode).parquet(dest)
    return n_files

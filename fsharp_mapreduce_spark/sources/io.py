"""Batch sources & sinks (SURVEY.md §2c "file formats / connectors").

The reference has exactly one source abstraction — the user-supplied
``dataLoadFn : skip -> take -> obj list`` (Loader.fs:17) — and no sink
beyond the driver callback. Here every standard format is a first-class
reader/writer; Spark owns split planning (the skip/take cursor,
Loader.fs:14,38) and parallel writes.

All readers take explicit schemas where the format needs one —
inference is a driver-side full scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

READ_FORMATS = ("parquet", "orc", "csv", "json", "text")


def read(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    if fmt not in READ_FORMATS and fmt != "jdbc":
        raise ValueError(f"unsupported format: {fmt}")
    if fmt == "jdbc":
        return read_jdbc(spark, **options)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)


def write(
    df: DataFrame,
    fmt: str,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    num_files: int | None = None,
    **options,
) -> None:
    """Parallel write. ``partition_by`` gives hive-style directory
    partitioning (the pruning handle for downstream readers);
    ``num_files`` coalesces tiny outputs (small-file problem)."""
    if num_files is not None:
        df = df.coalesce(num_files)
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def read_jdbc(spark: SparkSession, url: str = "", dbtable: str = "", **options) -> DataFrame:
    """JDBC source — needs a driver jar on the classpath, which this
    container doesn't ship; the call path is real, the environment
    gate is explicit."""
    if not url:
        raise NotImplementedError(
            "JDBC requires a database driver jar on the Spark classpath; "
            "pass url/dbtable/driver options on a real cluster"
        )
    return spark.read.format("jdbc").options(url=url, dbtable=dbtable, **options).load()


def write_bucketed(
    df: DataFrame, table_name: str, bucket_cols: list[str], n_buckets: int, mode: str = "overwrite"
) -> None:
    """Bucketed managed table: pre-shuffles once at write so later
    joins/aggs on ``bucket_cols`` skip their exchange — the standard
    co-location play for repeatedly-joined 100 TB facts."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table_name)
    )


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options,
) -> int:
    """Size-targeted write — the small-files tool a 100 TB pipeline
    needs at every materialization boundary: too many tiny files make
    downstream listing/scheduling the bottleneck (NameNode pressure,
    one task per splinter); too few giant files cap read parallelism.

    File count = ceil(estimated_bytes / target): the estimate comes
    from Catalyst's logical plan statistics (`sizeInBytes` — for plain
    scans the files' actual footprint, for derived plans the
    optimizer's propagated estimate, both available WITHOUT executing
    the plan or collecting data). The repartition is round-robin so
    output files are even-sized regardless of input key skew. Returns
    the file count it chose.

    Two deliberate non-choices: `coalesce` (narrows parallelism of the
    WRITING stage itself and inherits upstream skew) and
    `maxRecordsPerFile` (per-task cap — a skewed stage still emits
    splinter files per task)."""
    est_bytes = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    # Stat-less leaves (custom Python DataSources, RDD-backed plans,
    # JDBC) report defaultSizeInBytes ≈ Long.MaxValue; dividing that by
    # the target would ask for billions of shuffle partitions. Refuse
    # loudly instead of scheduling a doomed write (code-review r4).
    if est_bytes >= (1 << 62):
        raise ValueError(
            "write_compacted: the plan has no usable size statistics "
            f"(sizeInBytes={est_bytes}) — materialize to a stat-carrying "
            "format first or use write(..., num_files=...) explicitly"
        )
    n_files = max(1, -(-est_bytes // target_file_bytes))
    if n_files > 1_000_000:  # sanity ceiling: ~128 TB at the default target
        raise ValueError(
            f"write_compacted: {n_files} files from est={est_bytes}B at "
            f"target={target_file_bytes}B — raise target_file_bytes"
        )
    if fmt == "csv":  # same default as write() — one rule per module
        options.setdefault("header", "true")
    writer = df.repartition(n_files).write.mode(mode).options(**options)
    writer.format(fmt).save(path)
    return n_files


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int,
    bits: int = 16,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options,
) -> None:
    """Z-order (Morton-curve) file layout — the data-skipping tool for
    MULTI-column predicates. A plain sort by column A packs A's
    min/max ranges tightly per file but leaves every other column's
    range corpus-wide in every file, so filters on B skip nothing.
    Interleaving the bits of the (range-normalized) columns orders
    rows along a space-filling curve: every z-ordered column gets
    NARROW per-file min/max ranges simultaneously, and parquet
    footer/row-group statistics let readers skip most files for a
    selective predicate on ANY of them. At 100 TB this is the
    difference between a full scan and reading a few percent for the
    dimensional slices analysts actually run (the layout play behind
    Delta/Iceberg's OPTIMIZE ZORDER, implemented here with plain
    DataFrame ops — no table format required).

    Mechanics: one aggregate computes each column's (min, max)
    (bounded driver scalars); each column is scaled to a {bits}-bit
    integer rank; ranks are bit-interleaved into a Morton key with
    expression-only shifts/ORs (JVM codegen, no UDF); rows are
    range-partitioned AND sorted within partitions by the key, so
    files tile the curve in contiguous runs. The key never reaches
    the output schema.

    Numeric/timestamp-castable columns only — categorical columns
    need a dictionary rank first (join a small rank table, then pass
    the rank column)."""
    ncols = len(zorder_cols)
    if ncols < 2:
        raise ValueError("z-ordering needs >= 2 columns (use a plain sort for 1)")
    if bits * ncols > 62:
        raise ValueError(f"bits*ncols = {bits * ncols} > 62 overflows the BIGINT key")

    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(zorder_cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(zorder_cols)],
    ).collect()[0]

    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(zorder_cols):
        mn, mx = bounds[f"mn_{j}"], bounds[f"mx_{j}"]
        if (mn is None or mx is None) and not df.isEmpty():
            # a non-empty column whose double-cast is all NULL is a
            # misuse (string IDs etc.) — raise instead of silently
            # emitting a half-ordered layout with zero skip on it
            raise ValueError(
                f"write_zordered: column {c!r} casts to NULL for every "
                "row — z-order columns must be numeric/timestamp; rank "
                "categoricals through a dictionary first"
            )
        if mn is None or mx is None or mx <= mn:
            rank = F.lit(0).cast("long")  # constant/empty column: no bits
        else:
            scaled = (F.col(c).cast("double") - F.lit(mn)) / F.lit(mx - mn) * top
            rank = F.least(
                F.greatest(F.round(scaled, 0).cast("long"), F.lit(0)), F.lit(top)
            )
        for b in range(bits):
            bit = F.shiftright(rank, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ncols + j))

    keyed = df.withColumn("__zkey", z)
    out_cols = df.columns
    if fmt == "csv":
        options.setdefault("header", "true")
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .select(*out_cols)
        .write.mode(mode)
        .options(**options)
        .format(fmt)
        .save(path)
    )


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> int:
    """CDC upsert (MERGE) into a hive-partitioned parquet table
    WITHOUT a table format: rows in ``updates`` replace target rows
    with the same key and insert otherwise. The cost is the whole
    point — only the partitions the update batch TOUCHES are read and
    rewritten:

    1. the batch's distinct partition values collect to the driver
       (bounded by the batch, not the table) and prune the target
       read to the affected directories;
    2. affected-partition survivors (left-anti on the keys) union
       the updates;
    3. the write uses DYNAMIC partition overwrite, so Spark replaces
       exactly the partition directories present in the output —
       untouched partitions keep their files byte-for-byte (pinned by
       tests/test_sources.py::test_merge_upsert_rewrites_only_touched_partitions).

    At 100 TB this is the nightly-CDC pattern: a day's updates touch
    a handful of date partitions; the merge costs O(affected
    partitions), not O(table). A table format (Delta/Iceberg) buys
    row-level deletes and snapshot isolation on top; the partition
    economics are the same. The merged plan is localCheckpoint-ed
    before the write because Spark refuses to overwrite a path it is
    concurrently reading (self-overwrite hazard). Updates must not
    contain duplicate keys (last-writer would be nondeterministic) —
    refused loudly. Returns the number of partitions rewritten."""
    from pyspark.sql import functions as F

    dup = (
        updates.groupBy(*key_cols).count().where(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            f"merge_upsert: updates contain duplicate keys on {key_cols} — "
            "deduplicate the batch first (last-writer order is undefined)"
        )
    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    # NULL partition values need an explicit isNull branch: `isin`
    # never matches NULL (three-valued logic), so without it the
    # existing __HIVE_DEFAULT_PARTITION__ rows would not be read back
    # while dynamic overwrite still replaces that directory — silently
    # dropping them (ADVICE r5).
    affected = F.col(partition_col).isin([p for p in parts if p is not None])
    if any(p is None for p in parts):
        affected = affected | F.col(partition_col).isNull()
    existing = spark.read.parquet(target_path).where(affected)
    merged = existing.join(
        updates.select(*key_cols), key_cols, "left_anti"
    ).unionByName(updates)
    # break lineage: the write target is also the read source
    merged = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(parts)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet dataset whose files were written under EVOLVING
    schemas (columns added over time — the normal life of a 100 TB
    table that has been ingesting for years): ``mergeSchema`` unions
    the per-file footer schemas, files written before a column existed
    surface NULL for it, and predicate pushdown / column pruning still
    apply per file. Schema merging reads every footer, so production
    tables should pin the merged schema in a catalog once known —
    this entry point is for the discovery/read-side of evolution;
    `merge_upsert`/`write_compacted` handle the write side."""
    return spark.read.option("mergeSchema", "true").parquet(path)

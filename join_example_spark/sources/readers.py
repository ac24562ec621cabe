"""Parquet sources with explicit, deterministic normalization.

Design notes (100 TB posture):

- All reads are plain ``spark.read.parquet`` — the vectorized parquet
  reader, predicate pushdown, and column pruning apply untouched because
  normalization below is expressed as Catalyst column expressions, never
  Python UDFs.
- No schema inference beyond the parquet footer (deterministic).
- ``events.ts`` has shipped under TWO encodings across fixture
  generations, so the reader dispatches on the arriving dtype instead of
  hard-coding either (a hard-coded recipe broke 30 queries in round 2):

  * parquet ``TIMESTAMP(NANOS)`` — Spark 4.x cannot read it natively;
    with ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as
    int64 nanoseconds and we convert with *integer* division
    (``ts div 1000``) so the µs value is exact (a float division would
    round through a 53-bit mantissa and can be off by 1 µs at 2024-era
    epochs). Bit-identical to DuckDB's ns→µs truncating read.
  * parquet ``TIMESTAMP(MICROS)`` / ``isAdjustedToUTC=false`` — arrives
    as ``timestamp_ntz``; under the UTC session a plain
    ``cast("timestamp")`` is bit-identical to DuckDB's read (verified
    value-for-value at sf0.001).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from join_example_spark.conf import ensure_session_confs

#: Every table the driver pre-registers as a DuckDB view, in a stable order.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to TimestampType regardless of fixture encoding.

    Dispatches on the dtype the scan delivers (the single home of this
    recipe — batch and streaming readers must both go through it):

    - ``bigint``         → nanosAsLong int64 ns; exact ns→µs truncation
      via integer division (``timestamp_micros(ts div 1000)``).
    - ``timestamp_ntz``  → TIMESTAMP_MICROS/isAdjustedToUTC=false;
      ``cast("timestamp")`` under the UTC session (bit-identical to
      DuckDB).
    - ``timestamp``      → already the target type; pass through.
    - anything else      → raise with the observed dtype (loud failure on
      the next silent fixture drift, not 30 broken queries downstream).
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    if dtype == "timestamp":
        return df
    raise TypeError(
        f"events.ts arrived as unexpected dtype {dtype!r}; expected 'bigint' "
        "(TIMESTAMP(NANOS) via nanosAsLong), 'timestamp_ntz' "
        "(TIMESTAMP_MICROS, isAdjustedToUTC=false), or 'timestamp'. "
        "The fixture encoding drifted again — extend normalize_event_ts."
    )


def probe_stream_schema(
    spark: SparkSession, source_dir: str, glob: str | None = None
) -> StructType:
    """Footer-probe a directory's parquet schema for use as a file-stream
    schema (streaming sources require an explicit schema; inferring it from
    the actual footer instead of hard-coding keeps the stream readers
    encoding-agnostic, exactly like the batch side). Footer-only — no data
    scan, one listing, same cost the stream source itself pays at start."""
    ensure_session_confs(spark)
    reader = spark.read
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(source_dir.rstrip("/")).schema


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the ``events`` stream table, normalizing ``ts``.

    Returns ``ts`` as a proper ``TimestampType`` (µs precision, matching
    DuckDB's read bit-for-bit under either fixture encoding), all other
    columns untouched.
    """
    ensure_session_confs(spark)
    raw = spark.read.parquet(_path(sf_dir, "events"))
    return normalize_event_ts(raw)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read any fixture table by name, applying per-table normalization."""
    if name == "events":
        return read_events(spark, sf_dir)
    ensure_session_confs(spark)
    return spark.read.parquet(_path(sf_dir, name))


#: (sf_dir, table) -> exact row count, from parquet footer metadata.
_ROW_COUNT_CACHE: dict[tuple[str, str], int] = {}


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a fixture table from parquet FOOTER metadata —
    no data scan, no Spark job, cached per (sf_dir, table) for the session.

    Round 13 (VERDICT r12 task 4): the √n/∛n index-sizing dials in the ANN
    family previously ran ``emb.count()`` at plan-build time — a full-scan
    Spark job per query EXECUTION. Parquet writers record num_rows in every
    file footer, so the same exact integer is available driver-side for the
    cost of a metadata read, once. At 100 TB the equivalent is catalog
    statistics (or the same footer read over the manifest), still never a
    scan; counts of DERIVED dataframes (identity reps, contraction loops)
    are real jobs and stay on DataFrame.count().
    """
    import os

    import pyarrow.parquet as pq

    key = (sf_dir.rstrip("/"), name)
    if key not in _ROW_COUNT_CACHE:
        path = _path(sf_dir, name)
        if os.path.isdir(path):
            # Match Spark's file-index semantics: paths whose basename
            # starts with '_' or '.' (_temporary, _spark_metadata, hidden
            # files) are INVISIBLE to the scan, so they must not count
            # here either or the dial n diverges from what read_table sees.
            # No extension filter (ADVICE r13): Spark's file index reads
            # every non-hidden file regardless of suffix, so an
            # extension-less part file must count here too (a non-parquet
            # stray makes BOTH sides fail loudly — read_metadata here, the
            # scan there — which is the agreement we want).
            total = 0
            for root, dirs, files in os.walk(path):
                dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
                total += sum(
                    pq.read_metadata(os.path.join(root, f)).num_rows
                    for f in files
                    if not f.startswith(("_", "."))
                )
            _ROW_COUNT_CACHE[key] = total
        else:
            _ROW_COUNT_CACHE[key] = pq.read_metadata(path).num_rows
    return _ROW_COUNT_CACHE[key]


def _parse_byte_size(value: str) -> int:
    """Parse a Spark byte-size conf string ("134217728", "128MB", "1g",
    "134217728b") into bytes. Mirrors Spark's JavaUtils.byteStringAsBytes
    for the suffixes that appear in SQL confs."""
    s = value.strip().lower()
    units = {
        "k": 1 << 10, "kb": 1 << 10,
        "m": 1 << 20, "mb": 1 << 20,
        "g": 1 << 30, "gb": 1 << 30,
        "t": 1 << 40, "tb": 1 << 40,
        "b": 1,
    }
    for suffix in sorted(units, key=len, reverse=True):
        if s.endswith(suffix):
            return int(s[: -len(suffix)]) * units[suffix]
    return int(s)


def fanout_repartition(df: DataFrame, getsize=os.path.getsize) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism — ONLY when its parquet footprint is too small to split
    naturally. Scale-adaptive by construction; identical results either
    way (partition-independence is pinned by tests/test_determinism.py).

    Round-15 finding (guide §2.6 idle capacity / §2.5 fan-out): every
    fixture table is a single parquet split (594 KB documents, one row
    group), so the FIRST stage of every plan — which is where this
    engine's per-row-expensive work lives (char folds, banded levenshtein
    on broadcast-join probe fan-out, HOF token analysis, PQ/centroid
    assignment dots against broadcast tables) — ran on ONE core of 32
    until the first exchange. Measured: the banded-levenshtein verify
    dropped 3.9 s → 0.45 s with the probe side spread 32 ways.

    The guard makes this a no-op at scale: when the estimated natural
    split count already reaches the session's parallelism, the DataFrame
    is returned unchanged — a 100 TB scan is already wide, and a blanket
    repartition there would be a full shuffle of the payload for nothing.
    Only small-footprint inputs (where the shuffle is by definition
    cheap) are spread. The estimate is
    ``max(total_bytes // maxPartitionBytes + 1, n_files)`` — the split
    size comes from the session's ``spark.sql.files.maxPartitionBytes``
    (not a hardcoded 128 MB, so a deployment that tunes the conf keeps a
    correct guard), and the file-count floor covers many-small-files
    layouts where Spark produces at least one split per file boundary
    class (round-16, VERDICT/ADVICE r15).
    ``inputFiles()`` is driver-side file-index metadata — no Spark job.
    Round-robin (keyless) repartition is retry-safe: Spark sorts before
    repartitioning (``spark.sql.execution.sortBeforeRepartition``).
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
        total = sum(
            getsize(f[len("file:"):] if f.startswith("file:") else f)
            for f in files
        )
        max_split = _parse_byte_size(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
        )
    except Exception:  # noqa: BLE001 — estimation only; never break a plan
        return df
    est_splits = max(total // max(max_split, 1) + 1, len(files))
    if est_splits >= par:
        return df
    return df.repartition(par)


def register_temp_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views (for ``spark.sql`` paths)."""
    for name in names:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)

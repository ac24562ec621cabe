"""Fixture-drift guard + events-encoding regression tests.

Round 2 lost its entire driver bench to a silent fixture change (events.ts
flipped parquet TIMESTAMP(NANOS) -> TIMESTAMP(MICROS)/ntz). These tests make
the NEXT drift loud and local:

- the footer types of all 10 fixture tables are pinned against the
  expectations below, failing with the observed arrow schema;
- ``normalize_event_ts`` is pinned to produce identical TimestampType
  values from BOTH historical ts encodings, and to raise loudly on an
  unknown one.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from join_example_spark.sources.readers import (
    TABLES,
    normalize_event_ts,
    read_events,
)
from tests.conftest import SF_SMOKE

#: column -> set of acceptable arrow type strings. A set (not a single
#: value) wherever the fixture has legitimately shipped multiple encodings.
EXPECTED_FOOTER_TYPES: dict[str, dict[str, set[str]]] = {
    "region": {
        "r_regionkey": {"int32"},
        "r_name": {"string"},
    },
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string"},
        "p_brand": {"string"},
        "p_type": {"string"},
        "p_size": {"int32"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"timestamp[us]"},
    },
    "events": {
        "event_id": {"int64"},
        # BOTH encodings this fixture has ever shipped. Anything else must
        # fail here (and normalize_event_ts raises), not 30 queries deep.
        "ts": {"timestamp[ns]", "timestamp[us]"},
        "user_id": {"int64"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.parametrize("table", TABLES)
def test_fixture_footer_types_pinned(table):
    schema = pq.ParquetFile(f"{SF_SMOKE}/{table}.parquet").schema_arrow
    observed = {f.name: str(f.type) for f in schema}
    expected = EXPECTED_FOOTER_TYPES[table]
    drifted = {
        col: observed.get(col, "<MISSING>")
        for col, ok in expected.items()
        if observed.get(col, "<MISSING>") not in ok
    }
    assert not drifted, (
        f"fixture drift in {table}.parquet: columns {drifted} no longer match "
        f"{ {c: sorted(expected[c]) for c in drifted} }. Full observed schema: "
        f"{observed}. Update readers/EXPECTED_FOOTER_TYPES deliberately."
    )


def test_read_events_yields_timestamp_type(spark):
    df = read_events(spark, SF_SMOKE)
    assert isinstance(df.schema["ts"].dataType, TimestampType), df.dtypes


def test_normalize_event_ts_both_encodings_identical(spark, tmp_path):
    """The same instants written as int64-ns and as timestamp[us] must
    normalize to identical TimestampType values (and match a literal)."""
    # 2024-01-02 03:04:05.678901 UTC, plus a sub-µs-ns case that must
    # truncate (not round) to match DuckDB.
    ns_values = [1_704_164_645_678_901_000, 1_704_164_645_678_901_999]
    pq.write_table(
        pa.table({"ts": pa.array(ns_values, pa.int64())}),
        tmp_path / "nanos.parquet",
    )
    pq.write_table(
        pa.table({"ts": pa.array([v // 1000 for v in ns_values], pa.timestamp("us"))}),
        tmp_path / "micros.parquet",
    )
    got_ns = normalize_event_ts(
        spark.read.parquet(str(tmp_path / "nanos.parquet"))
    )
    got_us = normalize_event_ts(
        spark.read.parquet(str(tmp_path / "micros.parquet"))
    )
    assert isinstance(got_ns.schema["ts"].dataType, TimestampType)
    assert isinstance(got_us.schema["ts"].dataType, TimestampType)
    a = sorted(r.ts for r in got_ns.collect())
    b = sorted(r.ts for r in got_us.collect())
    assert a == b, (a, b)
    assert str(a[0]) == "2024-01-02 03:04:05.678901", a


def test_normalize_event_ts_unknown_dtype_raises(spark):
    df = spark.range(1).select(F.lit("oops").alias("ts"))
    with pytest.raises(TypeError, match="unexpected dtype 'string'"):
        normalize_event_ts(df)


def test_embedding_dim_pinned_to_64():
    """The PQ operators slice embeddings into 4×16-dim subvectors and the
    int8/IVF paths assume the documented dim=64 — a silent dim change
    would mis-slice without erroring (slice() truncates). Pin it at every
    SF via the parquet statistics-free path: read one row group's column."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        dims = con.execute(
            f"""
            SELECT DISTINCT LEN(embedding)
            FROM read_parquet('/root/testdata/{sf}/embeddings.parquet')
            """
        ).fetchall()
        con.close()
        assert dims == [(64,)], f"{sf}: embedding dims drifted: {dims}"


def test_documents_vocabulary_within_sketch_exact_regime():
    """q_agg_approx_topk is certified exact ONLY while the corpus
    vocabulary fits inside approx_top_k's maxItemsTracked=10000 (round-3
    ADVICE: exactness depends on tracked slots, not on k). If a future
    fixture generation ships a realistic vocabulary, fail HERE — loudly —
    instead of hash-mismatching at the driver. Checked at every fixture SF
    (the driver oracles at sf0.01; bench reads sf0.1)."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        (vocab,) = con.execute(
            f"""
            SELECT COUNT(DISTINCT tok) FROM (
                SELECT unnest(string_split(LOWER(TRIM(text)), ' ')) AS tok
                FROM read_parquet('/root/testdata/{sf}/documents.parquet')
                WHERE text IS NOT NULL AND LEN(TRIM(text)) > 0
            )
            """
        ).fetchone()
        con.close()
        assert vocab < 10000, (
            f"{sf}: documents vocabulary {vocab} >= maxItemsTracked 10000 — "
            "approx_top_k counts are no longer provably exact; retune "
            "maxItemsTracked in q_agg_approx_topk or re-certify"
        )


def test_documents_embeddings_row_counts_pinned():
    """Two distinct drift risks live in these row counts (round-8 pins):

    1. documents vs embeddings do NOT scale together at sf0.1 (5000 vs
       2000) — round 4 mis-sized a shortlist dial assuming they did.
    2. The adaptive ANN dials (adaptive_nprobe / adaptive_imi_dials) are
       derived from the embeddings count at plan-build time, and several
       oracle twins HARDCODE the operating point those counts imply
       (``arn <= 5`` in the IVF oracles; the (4, 8) IMI beam). A
       regenerated fixture with different counts would diverge query vs
       oracle SILENTLY — surfacing as a driver hash mismatch instead of a
       dial mismatch (round-7 ADVICE). Fail here, loudly, instead.
    """
    import pyarrow.parquet as pq

    from join_example_spark.operators.similarity import (
        adaptive_imi_dials,
        adaptive_nprobe,
    )

    expected = {
        ("sf0.001", "documents"): 500,
        ("sf0.001", "embeddings"): 500,
        ("sf0.01", "documents"): 500,
        ("sf0.01", "embeddings"): 500,
        ("sf0.1", "documents"): 5000,
        ("sf0.1", "embeddings"): 2000,
    }
    for (sf, table), want in expected.items():
        got = pq.read_metadata(f"/root/testdata/{sf}/{table}.parquet").num_rows
        assert got == want, (
            f"{sf}/{table}: row count drifted {want} -> {got}. If embeddings "
            "changed: re-derive the hardcoded oracle operating points "
            "(arn <= 5 / IMI (4, 8)) before trusting any ANN oracle."
        )
    from join_example_spark.operators.similarity import margin_screen_dials

    for n_emb in (500, 2000):
        assert adaptive_nprobe(n_emb) == 5, (
            f"adaptive_nprobe({n_emb}) != 5 — the IVF oracles hardcode arn <= 5"
        )
        assert adaptive_imi_dials(n_emb) == (4, 8), (
            f"adaptive_imi_dials({n_emb}) != (4, 8) — IMI oracles pin this beam"
        )
        assert margin_screen_dials(n_emb) == (4, 5), (
            f"margin_screen_dials({n_emb}) != (4, 5) — the margin oracle "
            "hardcodes arn <= 4 (corpus) / arn <= 5 (probes)"
        )


def test_events_user_id_never_null():
    """Round-13 pin (VERDICT r12 task 3): the two-level count-distinct
    rewrites (q_agg_approx_distinct, q_stream_distinct_users) use
    ``count(user_id)`` as the exact per-key distinct count — correct for
    NULLs by SQL semantics, but the surrounding determinism notes (and the
    HLL exact-anchor certification) assume the fixture's user_id column is
    fully populated. A regenerated fixture that starts shipping NULL
    user_ids would quietly change every per-user metric's denominator;
    fail here instead."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        (nulls,) = con.execute(
            f"SELECT COUNT(*) FROM "
            f"read_parquet('/root/testdata/{sf}/events.parquet') "
            f"WHERE user_id IS NULL"
        ).fetchone()
        con.close()
        assert nulls == 0, f"{sf}: events.user_id grew {nulls} NULLs"


def test_primary_keys_unique():
    """Round-13 pin (VERDICT r12 task 3): every unique-key tiebreak rule in
    SURVEY §5.3 (LIMIT/row_number total orders, keep-lowest-id dedup, asof
    uniqueness) leans on these columns being genuinely unique. Duplicated
    keys after a fixture regeneration would make tie-broken outputs
    nondeterministic BETWEEN engines while staying plausible within each —
    the worst drift mode. Fail here, loudly, at every SF."""
    import duckdb

    keys = {
        "events": "event_id",
        "documents": "doc_id",
        "embeddings": "vec_id",
        "orders": "o_orderkey",
        "customer": "c_custkey",
        "part": "p_partkey",
        "supplier": "s_suppkey",
    }
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        for table, key in keys.items():
            (n, nd) = con.execute(
                f"SELECT COUNT(*), COUNT(DISTINCT {key}) FROM "
                f"read_parquet('/root/testdata/{sf}/{table}.parquet')"
            ).fetchone()
            assert n == nd, f"{sf}/{table}.{key}: {n} rows, {nd} distinct"
        con.close()


def test_events_ts_value_domain_pinned(spark):
    """Round-9 pin (r8 verdict stretch #8): the events table's TIME DOMAIN,
    not just its encoding. Every windowed/sessionized/gap-filled query's
    row counts depend on the 2024-01 value range; a regenerated fixture
    with a shifted domain would silently change all of them and surface
    only as a wall of driver hash mismatches. Fail here, in one obvious
    place, instead. Goes through read_events so the pin holds under BOTH
    ts encodings the fixture has shipped with (int64 nanos / timestamp)."""
    import datetime

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        lo, hi = (
            read_events(spark, f"/root/testdata/{sf}")
            .agg(F.min("ts"), F.max("ts"))
            .first()
        )
        assert lo >= datetime.datetime(2024, 1, 1), (sf, lo)
        assert hi < datetime.datetime(2024, 2, 1), (sf, hi)
        # and the span covers most of the month — a truncated regeneration
        # (one day of data) would also reshape every windowed answer
        assert hi - lo > datetime.timedelta(days=25), (sf, lo, hi)

"""Round-8 pins: the calibrated 0.85-recall dial schedule, the re-declared
(former rows-only) queries' structural properties, and the one-job CC round.

The heavy evidence for this round lives in driver artifacts and SCALE.md
§3.11 (tools/calibrated_recall_sweep.py measured the dial landing points at
the 8×/64× rotation tiers); these tests pin the cheap, deterministic facts
so a future edit that silently moves an operating point fails here first.
"""

from __future__ import annotations

import pytest

from join_example_spark.operators.similarity import adaptive_nprobe


class TestCalibratedRecallDial:
    def test_fixture_sfs_unchanged_by_target(self):
        # At every fixture rep count the floor keeps BOTH schedules at the
        # audited nprobe=5 — declared-query plans and oracles are identical
        # with or without the target, by construction.
        for n in (1, 500, 2000, 2025):
            assert adaptive_nprobe(n) == 5
            assert adaptive_nprobe(n, target_recall=0.85) == 5

    def test_measured_landing_points(self):
        # The calibrated schedule must land exactly on the MEASURED sweep
        # points (tools/calibrated_recall_sweep.py, round 8):
        #   n=16k  -> p=8  (recall 0.8508, 3.5x fewer work pairs than p=15)
        #   n=128k -> p=13 (recall 0.8847, 9.5x fewer work pairs than p=40)
        # Moving either point invalidates the SCALE.md §3.11 recall claim.
        assert adaptive_nprobe(16000, target_recall=0.85) == 8
        assert adaptive_nprobe(128000, target_recall=0.85) == 13
        # and the recall-1.0 schedule they are compared against:
        assert adaptive_nprobe(16000) == 15
        assert adaptive_nprobe(128000) == 40

    def test_monotone_and_dominated(self):
        # The target schedule never probes MORE than the constant-fraction
        # schedule, and still grows with n (it is a calibration down, not a
        # fixed constant — fixed constants are the measured recall-collapse
        # failure mode, SCALE.md §3.7b).
        prev = 0
        for n in (2025, 4000, 16000, 64000, 128000, 512000, 1000000):
            p85 = adaptive_nprobe(n, target_recall=0.85)
            assert p85 <= adaptive_nprobe(n)
            assert p85 >= prev
            prev = p85
        assert adaptive_nprobe(1_000_000, target_recall=0.85) > 5

    def test_uncalibrated_target_raises(self):
        # 0.90 became a calibrated notch in round 9, 0.95 in round 10;
        # anything else stays unswept and must raise.
        with pytest.raises(ValueError, match="calibrated"):
            adaptive_nprobe(16000, target_recall=0.99)

    def test_imi_knee_schedule_landing_points(self):
        # IMI twin (SCALE.md §3.11b): constant fraction is already IN-BAND
        # at 16k (T=32 -> recall 0.9396 measured), so the knee keeps the
        # schedules identical there; at 128k the calibrated beam must land
        # on the MEASURED (8, 50) point (recall 0.9054, 5.9x fewer work
        # pairs than the default (12, 124) at 0.9975).
        from join_example_spark.operators.similarity import adaptive_imi_dials

        for n in (500, 2000, 16000):
            assert adaptive_imi_dials(n, target_recall=0.85) == adaptive_imi_dials(n)
        assert adaptive_imi_dials(128000) == (12, 124)
        assert adaptive_imi_dials(128000, target_recall=0.85) == (8, 50)
        # 0.95 was calibrated in round 11 (test_round11_ops pins it);
        # still-uncalibrated targets raise.
        with pytest.raises(ValueError, match="calibrated"):
            adaptive_imi_dials(128000, target_recall=0.99)


class TestRedeclaredTrio:
    """The three former rows-only queries are now full oracle citizens —
    their value-level parity is covered by the mirror suites; here we pin
    the structural facts the re-declaration depends on."""

    def test_all_registry_entries_have_oracles(self):
        # Round 7 proved the driver has NO rows-only mode (err: no_oracle).
        # Since round 8 the registry must stay 100% driver-checkable.
        from join_example_spark.registry import load_all

        rows_only = [n for n, s in load_all().items() if s.oracle is None]
        assert rows_only == [], f"rows-only queries reintroduced: {rows_only}"

    def test_knn_scale_emits_oracle_assertable_audit(self, spark):
        # Exact anchors + a literally-asserted boolean (the HLL pattern):
        # the boolean must be TRUE — if LSH recall ever dips under the 0.8
        # gate the driver row goes red, which is exactly the contract.
        from join_example_spark.registry import load_all

        row = (
            load_all()["q_llm_sim_knn_scale"]
            .fn(spark, "/root/testdata/sf0.001")
            .collect()[0]
        )
        assert row.recall_ok is True
        assert row.n_vectors == 500
        assert row.n_true_sampled > 0

    def test_portable_simhash_banding_complete_at_radius(self, spark):
        # GENUINE pigeonhole-completeness check (the oracle twin applies
        # the SAME 4-band condition, so a banding recall hole would be
        # consistent on both sides and invisible to the mirror): compare
        # the banded query output against a band-FREE quadratic
        # hamming <= 3 twin in DuckDB. Equality proves the 4x8-bit
        # multi-index drops no pair within radius 3.
        import duckdb

        from join_example_spark.registry import load_all

        spec = load_all()["q_llm_dedup_simhash"]
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in spec.fn(spark, "/root/testdata/sf0.001").collect()
        }
        # Band-free twin: the declared oracle with the band OR-condition
        # removed from the candidate join (pure a < b quadratic).
        sql = spec.oracle
        start = sql.index("AND ((a.sig // 1) % 256")
        end = sql.index("16777216) % 256)") + len("16777216) % 256)")
        sql_unbanded = sql[:start] + sql[end:]
        assert sql_unbanded != sql, "band-condition strip failed to match"
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        want = {
            (r[0], r[1], r[2]) for r in con.sql(sql_unbanded).fetchall()
        }
        con.close()
        assert got == want
        assert len(got) > 0  # non-vacuous at this SF

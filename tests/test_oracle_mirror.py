"""The local pre-flight mirror of the driver's t2 check (SURVEY.md §5.2).

Every declared query with an oracle must hash-match DuckDB at sf0.001
(fast inner loop). test_oracle_sf001.py repeats at sf0.01 (the driver's SF).
"""

from __future__ import annotations

import pytest

from join_example_spark.registry import load_all
from tests.conftest import SF_SMOKE
from tests.oracle_utils import run_compare

_SPECS = load_all()
_ORACLE_NAMES = [n for n, s in _SPECS.items() if s.oracle is not None]
_ROWS_ONLY = [n for n, s in _SPECS.items() if s.oracle is None]


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_match_smoke_sf(spark, name):
    problems = run_compare(spark, name, SF_SMOKE)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_no_rows_only_queries_remain():
    # Since round 8 every declared query ships an oracle (the driver has no
    # rows-only mode — CORRECTNESS_r07 evidence); the old parametrized
    # rows-only runner would now emit an empty-parameterset skip, so it is
    # replaced by this invariant (also pinned in tests/test_round8_ops.py).
    assert _ROWS_ONLY == []

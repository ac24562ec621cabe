"""Driver-SF mirror: every oracle query must match DuckDB at sf0.01 (t2)."""

from __future__ import annotations

import pytest

from join_example_spark.registry import load_all
from tests.conftest import SF_ORACLE
from tests.oracle_utils import run_compare

_ORACLE_NAMES = [n for n, s in load_all().items() if s.oracle is not None]


@pytest.mark.sf001
@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_match_driver_sf(spark, name):
    problems = run_compare(spark, name, SF_ORACLE)
    assert not problems, f"{name}: " + "; ".join(problems)

"""Run every registered query against its DuckDB oracle at sf0.001 —
the local twin of the driver's CORRECTNESS gate (it runs sf0.01)."""

from __future__ import annotations

import pytest

from rialto_airflow_spark.plans.queries import REGISTRY, queries
from tests.oracle_util import compare

queries()  # load extension registries
NAMES = sorted(REGISTRY)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    compare(df, spec.oracle, sf_dir, name)

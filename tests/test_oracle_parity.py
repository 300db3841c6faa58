"""Every registered query must match its DuckDB oracle at sf0.01 — the
same gate the driver runs (row count + columns + order-insensitive
values)."""

from __future__ import annotations

import gc

import pytest

from public_projet_data_engineering_tarification_electrique_spark.plans import (
    registry,
)

from .conftest import SF_ORACLE
from .oracle_utils import compare

NAMES = sorted(registry.QUERIES().keys())


@pytest.fixture(autouse=True)
def _release_blocks(spark):
    """Release per-query cached/persisted blocks (q97 materialize, q146
    basket persist) and localCheckpoint lineage so a 153-query session
    doesn't accumulate block-manager state (same hygiene as bench.py)."""
    yield
    spark.catalog.clearCache()
    gc.collect()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    fn = registry.QUERIES()[name]
    sql = registry.ORACLE_SQL.get(name)
    if sql is None:
        df = fn(spark, SF_ORACLE)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    compare(fn(spark, SF_ORACLE), duck, sql, name=name)


def test_registry_oracle_keys_subset():
    extra = set(registry.ORACLE_SQL) - set(registry.QUERIES())
    assert not extra, f"oracle entries without queries: {extra}"

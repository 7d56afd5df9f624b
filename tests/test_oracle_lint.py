"""Oracle output-type lint over the full query registry.

DuckDB widens window/aggregate SUMs over integers to HUGEINT (int128); the
driver's value normalizer renders int128 differently than Python's str(int),
so an uncast HUGEINT oracle column hash-mismatches on the driver while the
local replica stays green (the events_sessionize / pipeline_pretrain
three-round red, VERDICT r4).  This test makes that class of bug impossible
to re-introduce: every oracle_sql() entry must produce only allowlisted
DuckDB output types.  Linting uses the lazy relation schema — no query
executes, no Spark session is needed.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL
from tools.check_oracle import ALLOWED_ORACLE_TYPES, TABLES, lint_oracle_types


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    yield con
    con.close()


def test_all_oracle_output_types_allowlisted(oracle_con):
    import __spark_entry__ as entry_mod

    bad = {}
    for name, sql in entry_mod.oracle_sql().items():
        hits = lint_oracle_types(oracle_con, sql)
        if hits:
            bad[name] = hits
    assert not bad, f"off-allowlist oracle output types: {bad}"


def test_lint_catches_hugeint(oracle_con):
    # A window SUM over BIGINT is HUGEINT in DuckDB — the exact defect class.
    hits = lint_oracle_types(
        oracle_con,
        "SELECT SUM(r_regionkey) OVER (ORDER BY r_regionkey) AS s FROM region",
    )
    assert hits == [("s", "HUGEINT")]
    assert "HUGEINT" not in ALLOWED_ORACLE_TYPES


def test_lint_catches_any_decimal(oracle_con):
    # DECIMAL at ANY precision is driver-red: round 6 proved DECIMAL(38,4)
    # (int128-backed) mismatches, round 7 proved DECIMAL(18,4) does too —
    # trailing-zero fixed-scale values render differently under
    # str(Decimal) vs float-normalizing fetch paths.  The lint must refuse
    # the whole type family, wide or narrow.
    hits = lint_oracle_types(
        oracle_con,
        "SELECT SUM(CAST(r_regionkey AS DECIMAL(18,4))) AS s FROM region",
    )
    assert hits == [("s", "DECIMAL(38,4)")]
    hits = lint_oracle_types(
        oracle_con,
        "SELECT CAST(SUM(CAST(r_regionkey AS DECIMAL(18,4)))"
        " AS DECIMAL(18,4)) AS s FROM region",
    )
    assert hits == [("s", "DECIMAL(18,4)")]
    # ...while the fixed-point BIGINT rewrite (the mv_q3_incremental r8
    # convention) passes.
    assert (
        lint_oracle_types(
            oracle_con,
            "SELECT CAST(SUM(CAST(r_regionkey AS DECIMAL(18,4)))"
            " * 10000 AS BIGINT) AS s_e4 FROM region",
        )
        == []
    )

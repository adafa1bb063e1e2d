"""Pre-flight mirror of the driver's t2 harness: every hash-checked query
is compared against its DuckDB oracle under the DRIVER-FAITHFUL pandas
canonicalizer (``testing.compare_driver``: ``toPandas()`` vs duckdb
``.df()``, astype(str) rendering — the exact frames the driver hashes).
The r1 gap was comparing ``collect()`` vs ``fetchall()``, which preserves
Decimal/date objects the driver never sees and hid 14 hash failures +
one canonicalizer crash.  Rows-only queries must at least run and return
a stable schema twice.
"""

import pytest

from migbq_spark import registry
from migbq_spark.testing import compare_driver

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()

HASH_IDS = sorted(ORACLES)
ROWS_ONLY_IDS = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("qid", HASH_IDS)
def test_hash_parity(qid, spark, duck, sf_dir):
    df = QUERIES[qid](spark, sf_dir)
    res = compare_driver(df, duck, ORACLES[qid])
    assert res["ok"], {k: v for k, v in res.items() if k != "ok"}


@pytest.mark.parametrize("qid", ROWS_ONLY_IDS)
def test_rows_only_runs(qid, spark, sf_dir):
    """Rows-only ops must survive the driver's canonicalizer, not just
    count(): the real driver ALWAYS does a pandas sort over raw cells
    before recording spark_rows, and r6 shipped two ops whose
    array/struct cells crashed it (r6 VERDICT #1/#3).  Mirror that
    exactly — toPandas + _pd_canon — and fail on any unsafe column."""
    from migbq_spark.testing import _pd_canon

    df = QUERIES[qid](spark, sf_dir)
    pdf = df.toPandas()
    _, rows, _, unsafe = _pd_canon(pdf)
    assert not unsafe, f"driver-canonicalizer-unsafe columns: {unsafe}"
    # Canonical row count must equal the DataFrame's own count — a
    # canonicalizer that silently drops rows would otherwise pass.
    assert len(rows) == df.count()
    # stable schema on re-run
    df2 = QUERIES[qid](spark, sf_dir)
    assert df.columns == df2.columns


def test_every_query_has_contract_entry():
    assert QUERIES, "no queries registered"
    for qid in ORACLES:
        assert qid in QUERIES

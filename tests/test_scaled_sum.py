"""Property test for common.scaled_sum_agg: on arbitrary money doubles,
the two-level scaled-int64 accumulation must be value-identical to the
straightforward SUM(CAST(x AS DECIMAL(18,2))) it replaces — the invariant
the flagship and star-join queries rely on (SURVEY.md §7.4.1).

Also: double-run determinism for the float-sensitive hash queries — the
canonical output must not depend on partitioning or run order.
"""

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from migbq_spark import registry
from migbq_spark.common import cents, dec, scaled_sum_agg
from migbq_spark.testing import canon_rows

# money-like doubles incl. negatives, zeros, sub-cent fractions needing
# rounding, and values near the DECIMAL(18,2) fixture domain edges
money = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.tuples(st.integers(0, 3), money), min_size=1, max_size=300))
def test_scaled_sum_equals_decimal_sum(spark, rows):
    df = spark.createDataFrame(rows, "k int, v double").repartition(5)
    got = scaled_sum_agg(df, ["k"], [("s", cents("v"), 2)], count_alias="n")
    ref = df.groupBy("k").agg(
        # same terminal double cast as scaled_sum_agg (driver-hash type)
        F.sum(dec("v")).cast("decimal(38,2)").cast("double").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    _, a = canon_rows(got.columns, [tuple(r) for r in got.collect()])
    _, b = canon_rows(ref.columns, [tuple(r) for r in ref.collect()])
    assert a == b


FLOAT_SENSITIVE = [
    "agg_groupby_sum",
    "join_star_5way",
    "cosine_topk",
    "udtf_grouped_map",
    "near_dup_jaccard",
]


@pytest.mark.parametrize("qid", FLOAT_SENSITIVE)
def test_double_run_determinism(qid, spark, sf_dir):
    q = registry.queries()[qid]
    runs = []
    for _ in range(2):
        df = q(spark, sf_dir)
        runs.append(canon_rows(df.columns, [tuple(r) for r in df.collect()]))
    assert runs[0] == runs[1]

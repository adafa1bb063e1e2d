"""Emit a formatted-plan audit of the bench headline queries.

Writes PLANS_r{N}.md: for each HEADLINE query, the `.explain("formatted")`
physical plan at the bench scale factor plus a mechanical summary
(broadcast joins, exchanges, pushed filters, Python/Arrow nodes) — the
artifact a reviewer reads to check the 100 TB plan contract without
re-running anything.

Usage: python scripts/plan_audit.py [out.md]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from migbq_spark import registry  # noqa: E402
from migbq_spark.session import get_spark  # noqa: E402

OUT = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "PLANS_r03.md"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    sys.path.insert(0, str(REPO))
    import bench

    spark = get_spark("plan-audit")
    queries = registry.queries()
    lines = [
        "# PLAN AUDIT — bench headline queries",
        "",
        f"`.explain(\"formatted\")` at `{SF_DIR}` under the engine session",
        "(AQE on, 64 MB broadcast threshold, 32 shuffle partitions).",
        "Summary counts are mechanical greps of the physical plan.",
        "",
    ]
    import contextlib
    import io

    # r9: audit the heavy-family suites and the r9 additions alongside
    # the headline queries — the plans that matter most at 100 TB
    R9_OPS = [
        "pareto_skyline_quality_cost",
        "dedup_sorted_neighborhood",
        "knn_graph_rp_portable",
        "bm25_top_terms_source",
        "pagerank_event_graph",
        "keyphrase_rake_top",
        "bootstrap_ci_event_value",
        "weighted_median_per_key",
        "open_orders_backlog_daily",
        "tpch_q6_pipe_syntax",
        "tpch_q14_promo_effect",
        "props_variant_extract",
    ]
    # r12: the hierarchical-prefix rank statistics (the no-global-window
    # contract), the HITS edge-reuse shape, and the SQL-surface trio
    R12_OPS = [
        "mann_whitney_u_value",
        "roc_auc_exact",
        "pr_auc_trapezoid",
        "kruskal_wallis_value",
        "wilcoxon_signed_rank_paired",
        "mood_median_test",
        "hits_hub_authority",
        "degree_distribution_log2",
        "listagg_sorted_groups",
        "win_first_last_ignore_nulls",
        "try_arith_null_safety",
    ]
    audit = list(
        dict.fromkeys(bench.HEADLINE + bench.R8_FAMILY + R9_OPS + R12_OPS)
    )
    for qid in audit:
        df = queries[qid](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        summary = {
            "BroadcastHashJoin": plan.count("BroadcastHashJoin"),
            "SortMergeJoin": plan.count("SortMergeJoin"),
            "Exchange": plan.count("Exchange"),
            "HashAggregate": plan.count("HashAggregate"),
            "PushedFilters": plan.count("PushedFilters: ["),
            "Python/Arrow nodes": sum(
                plan.count(m)
                for m in ("EvalPython", "InPandas", "PythonMapInArrow")
            ),
        }
        lines += [
            f"## `{qid}`",
            "",
            "| " + " | ".join(summary) + " |",
            "| " + " | ".join("---" for _ in summary) + " |",
            "| " + " | ".join(str(v) for v in summary.values()) + " |",
            "",
            "```",
            plan.strip(),
            "```",
            "",
        ]
    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT} ({len(audit)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()

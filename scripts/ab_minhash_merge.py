"""Interleaved A/B for the r15 session-5 minhash_merge_incremental
one-pass rewrite: arm A = the r10 two-lineage form (copied verbatim
below), arm B = the module's one-pass conditional-aggregate form.
Both arms in ONE session, alternating; wall e2e + executor CPU via the
REST API.  Also asserts the two arms produce identical sorted rows.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from migbq_spark import registry  # noqa: E402
from migbq_spark.operators.pipeline import _MINHASH_K, _tok_df  # noqa: E402
from scripts.ab_ckpt_fuse import _cpu_since, _ui_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_form(spark, sf_dir):
    toks = _tok_df(spark, sf_dir)

    def h(i):
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(i), F.col("token"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")

    def sig(part):
        return (
            part.select("source", "token")
            .distinct()
            .groupBy("source")
            .agg(*[F.min(h(i)).alias(f"v{i}") for i in range(_MINHASH_K)])
        )

    base = sig(toks.filter(F.col("doc_id") % 2 == 0))
    delta = sig(toks.filter(F.col("doc_id") % 2 == 1))
    d = delta.select(
        F.col("source"),
        *[F.col(f"v{i}").alias(f"d{i}") for i in range(_MINHASH_K)],
    )
    merged = base.join(d, "source", "full").select(
        "source",
        *[
            F.least(F.col(f"v{i}"), F.col(f"d{i}")).alias(f"m{i}")
            for i in range(_MINHASH_K)
        ],
    )
    return merged.select(
        "source",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("bigint").alias("seed"),
                        F.col(f"m{i}").alias("v"),
                    )
                    for i in range(_MINHASH_K)
                ]
            )
        ).alias("sv"),
    ).select("source", "sv.seed", "sv.v")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    queries = registry.queries()
    new_form = queries["minhash_merge_incremental"]
    spark = _ui_spark()
    sc = spark.sparkContext
    ui, app = sc.uiWebUrl, sc.applicationId
    queries["agg_pk_bounds"](spark, SF_DIR).collect()

    a_rows = sorted(map(tuple, old_form(spark, SF_DIR).collect()))
    b_rows = sorted(map(tuple, new_form(spark, SF_DIR).collect()))
    assert a_rows == b_rows, "ARMS DIFFER"
    print(f"rows identical: {len(a_rows)}")

    res = {"old": [], "new": []}
    for r in range(rounds):
        for arm, fn in (("old", old_form), ("new", new_form)):
            sc.setJobDescription(f"ab-mmi:{arm}:r{r}")
            jobs0 = len(
                json.load(
                    urllib.request.urlopen(
                        f"{ui}/api/v1/applications/{app}/jobs"
                    )
                )
            )
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            jobs1 = json.load(
                urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs")
            )
            first = (
                sorted(j["jobId"] for j in jobs1)[jobs0]
                if len(jobs1) > jobs0
                else 0
            )
            cpu = _cpu_since(ui, app, first)
            res[arm].append((wall, cpu))
            print(f"{arm} r{r} wall={wall:6.3f}s cpu={cpu:6.2f}s", flush=True)
    for arm in ("old", "new"):
        walls = sorted(w for w, _ in res[arm])
        cpus = sorted(c for _, c in res[arm])
        print(
            f"{arm}: wall_min={walls[0]:6.3f} wall_med={walls[len(walls)//2]:6.3f} "
            f"cpu_min={cpus[0]:6.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

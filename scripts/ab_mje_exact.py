"""Interleaved A/B for the r15 session-5 minhash_jaccard_estimate
exact-jaccard rewrite: arm A = the r6 per-pair array_intersect form
(copied verbatim below), arm B = the module's exploded-postings form.
Asserts identical sorted rows, then alternates arms in ONE session
(wall + executor CPU via REST)."""

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
from migbq_spark.operators.control import load  # noqa: E402
from migbq_spark.operators.pipeline import (  # noqa: E402
    _MINHASH_K,
    _portable_band_df,
    _portable_minhash_df,
)
from scripts.ab_ckpt_fuse import _cpu_since, _ui_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_form(spark, sf_dir):
    mins_ck = _portable_minhash_df(spark, sf_dir).localCheckpoint()
    bands = _portable_band_df(spark, sf_dir, mins=mins_ck)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .repartition(spark.sparkContext.defaultParallelism, "a_id", "b_id")
        .dropDuplicates()
    )
    mins = mins_ck
    siga = mins.select(
        F.col("doc_id").alias("a_id"),
        F.array(*[f"mh{i}" for i in range(_MINHASH_K)]).alias("a_sig"),
    )
    sigb = mins.select(
        F.col("doc_id").alias("b_id"),
        F.array(*[f"mh{i}" for i in range(_MINHASH_K)]).alias("b_sig"),
    )
    n_match = F.size(
        F.filter(
            F.zip_with("a_sig", "b_sig", lambda x, y: x == y),
            lambda m: m,
        )
    )
    sets = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("toks"),
    )
    sa = sets.select(
        F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks")
    )
    sb = sets.select(
        F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks")
    )
    shared = F.size(F.array_intersect("a_toks", "b_toks"))
    exact = shared * F.lit(1.0) / (
        F.size("a_toks") + F.size("b_toks") - shared
    )
    est = F.col("__n_match") / F.lit(float(_MINHASH_K))
    return (
        cand.join(siga, "a_id")
        .join(sigb, "b_id")
        .withColumn("__n_match", n_match)
        .join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(est, 4).alias("est_jaccard"),
            F.round(exact, 4).alias("exact_jaccard"),
            F.round(F.abs(est - exact), 4).alias("abs_err"),
        )
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    queries = registry.queries()
    new_form = queries["minhash_jaccard_estimate"]
    spark = _ui_spark()
    sc = spark.sparkContext
    ui, app = sc.uiWebUrl, sc.applicationId
    queries["agg_pk_bounds"](spark, SF_DIR).collect()

    a = sorted(map(tuple, old_form(spark, SF_DIR).collect()))
    b = sorted(map(tuple, new_form(spark, SF_DIR).collect()))
    assert a == b, f"ARMS DIFFER: {len(a)} vs {len(b)}"
    print(f"rows identical: {len(a)}")

    res = {"old": [], "new": []}
    for r in range(rounds):
        for arm, fn in (("old", old_form), ("new", new_form)):
            sc.setJobDescription(f"ab-mje:{arm}:r{r}")
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
            f"{arm}: wall_min={walls[0]:6.3f} "
            f"wall_med={walls[len(walls)//2]:6.3f} cpu_min={cpus[0]:6.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Interleaved A/B for the r15 session-5 decontaminate_bloom_portable
vocabulary restructure: arm A = the r9 three-derivation form (copied
verbatim below), arm B = the module's single-groupBy flagged-vocab form.
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
    _BLOOM_K,
    _BLOOM_M,
    _SHINGLE_MIN_TOKS,
)
from scripts.ab_ckpt_fuse import _cpu_since, _ui_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_form(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.pmod("doc_id", F.lit(10)).alias("m"),
        F.expr("filter(split(text, ' '), t -> t <> '')").alias("t"),
    ).filter(F.size("t") >= _SHINGLE_MIN_TOKS)
    grams = base.select(
        "doc_id",
        "m",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(t) - 3),"
                    " i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2]))"
                )
            )
        ).alias("gram"),
    )

    def pos(j):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(j), F.col("gram"))), 1, 15
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(_BLOOM_M),
        )

    test_g = grams.filter(F.col("m") == 9).select("gram").distinct()
    bits = (
        test_g.select(
            F.explode(F.array(*[pos(j) for j in range(_BLOOM_K)])).alias("p")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    tvocab = grams.filter(F.col("m") < 8).select("gram").distinct()
    probe = tvocab.select(
        "gram",
        F.explode(F.array(*[pos(j) for j in range(_BLOOM_K)])).alias("p"),
    )
    gflag = (
        probe.join(F.broadcast(bits), "p", "left")
        .groupBy("gram")
        .agg(
            (F.count_if(F.col("hit").isNotNull()) == _BLOOM_K).alias(
                "bloom_hit"
            )
        )
    )
    gboth = gflag.join(
        F.broadcast(test_g.withColumn("in_test", F.lit(1))), "gram", "left"
    ).select(
        "gram", "bloom_hit", F.col("in_test").isNotNull().alias("exact_hit")
    )
    train_pairs = grams.filter(F.col("m") < 8).select("doc_id", "gram")
    n_bloom = F.count_if("bloom_hit")
    n_exact = F.count_if("exact_hit")
    return (
        train_pairs.join(gboth, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            n_bloom.alias("n_bloom"),
            n_exact.alias("n_exact"),
            (n_bloom >= 3).alias("bloom_dropped"),
            (n_exact >= 3).alias("exact_dropped"),
            ((n_bloom >= 3) & ~(n_exact >= 3)).alias("false_drop"),
        )
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    queries = registry.queries()
    new_form = queries["decontaminate_bloom_portable"]
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
            sc.setJobDescription(f"ab-bloom:{arm}:r{r}")
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

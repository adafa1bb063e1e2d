"""Interleaved A/B for the r15 session-5 knn_graph_rp_portable bucket
kernel: arm A = the r13 bucket-join + interpreted-fold form (copied
verbatim below), arm B = the module's grouped matmul kernel form.
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

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from migbq_spark import registry  # noqa: E402
from migbq_spark.operators.control import load  # noqa: E402
from migbq_spark.operators.pipeline import _rp_sign  # noqa: E402
from scripts.ab_ckpt_fuse import _cpu_since, _ui_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_form(spark, sf_dir):
    _N_PLANES = 12
    e = load(spark, sf_dir, "embeddings")
    scaled = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * F.lit(1000000.0)).cast("bigint"),
    )
    sv = e.repartition(spark.sparkContext.defaultParallelism).select(
        "vec_id", scaled.alias("se")
    )

    def proj(p):
        signs = F.array(*[F.lit(_rp_sign(p, j)) for j in range(64)])
        return F.aggregate(
            F.zip_with("se", signs, lambda x, s: x * s.cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    sig = sum(
        (
            F.when(proj(p) > 0, F.lit(1 << p)).otherwise(F.lit(0))
            for p in range(_N_PLANES)
        ),
        F.lit(0),
    ).cast("bigint")
    sigs = sv.select("vec_id", "se", sig.alias("sig")).localCheckpoint()
    probes = F.array(
        F.col("sig"),
        *[F.col("sig").bitwiseXOR(F.lit(1 << p)) for p in range(_N_PLANES)],
    )
    q = sigs.select(
        F.col("vec_id").alias("q_id"),
        F.col("se").alias("q_se"),
        F.explode(probes).alias("bucket"),
    )
    cand = sigs.select(
        F.col("vec_id").alias("n_id"),
        F.col("se").alias("n_se"),
        F.col("sig").alias("bucket"),
    )
    dot = F.aggregate(
        F.zip_with("q_se", "n_se", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("sim_scaled"), F.asc("n_id")
    )
    edges = (
        q.join(cand, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", dot.alias("sim_scaled"))
        .dropDuplicates(["q_id", "n_id"])
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .localCheckpoint()
    )
    rev = edges.select(
        F.col("n_id").alias("q_id"), F.col("q_id").alias("n_id")
    ).withColumn("m", F.lit(True))
    return edges.join(rev, ["q_id", "n_id"], "left").select(
        "q_id",
        "n_id",
        "sim_scaled",
        "rnk",
        F.coalesce("m", F.lit(False)).alias("mutual"),
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    queries = registry.queries()
    new_form = queries["knn_graph_rp_portable"]
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
            sc.setJobDescription(f"ab-knn:{arm}:r{r}")
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

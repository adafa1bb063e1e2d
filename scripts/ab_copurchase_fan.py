"""Interleaved A/B prototype: the co-purchase pair fan as a numpy
mapInArrow kernel vs the committed codegen nested-transform explode.

Arm A (old): flatten(transform(...)) explode -> repartition(k) -> count.
Arm B (new): mapInArrow over the basket ps arrays, emitting the packed
int64 pair keys via vectorized numpy (baskets grouped by length so the
pair expansion is a 2-D fancy-index, no per-row Python loop), then the
SAME repartition(k) -> count.

Asserts identical (u, v) edge sets, then times both arms interleaved
(wall + executor CPU via REST).
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

from migbq_spark.operators.control import load  # noqa: E402
from scripts.ab_ckpt_fuse import _cpu_since, _ui_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _baskets(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )


def old_fan(spark, sf_dir):
    return _baskets(spark, sf_dir).select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps) - i - 1),"
                " y -> x * 4294967296 + y)))"
            )
        ).alias("k")
    )


def _pair_fan_kernel(batches):
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        col = batch.column(0)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = offs[1:] - offs[:-1]
        starts = offs[:-1]
        out = []
        for n in np.unique(lens):
            if n < 2:
                continue
            group = starts[lens == n]
            idx = group[:, None] + np.arange(n)[None, :]
            M = vals[idx]  # (m, n) baskets of this length
            iu, ju = np.triu_indices(int(n), k=1)
            k = (M[:, iu] << np.int64(32)) + M[:, ju]
            out.append(k.ravel())
        ks = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        yield pa.record_batch([pa.array(ks, type=pa.int64())], names=["k"])


def new_fan(spark, sf_dir):
    return (
        _baskets(spark, sf_dir)
        .select("ps")
        .mapInArrow(_pair_fan_kernel, "k long")
    )


def edges_from(fan_df):
    return (
        fan_df.repartition("k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .select(
            F.expr("CAST(k div 4294967296 AS BIGINT)").alias("u"),
            F.expr("CAST(k % 4294967296 AS BIGINT)").alias("v"),
            "w",
        )
        .filter(F.col("w") >= 2)
        .select("u", "v")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = _ui_spark()
    sc = spark.sparkContext
    ui, app = sc.uiWebUrl, sc.applicationId
    spark.range(1).collect()

    a = sorted(map(tuple, edges_from(old_fan(spark, SF_DIR)).collect()))
    b = sorted(map(tuple, edges_from(new_fan(spark, SF_DIR)).collect()))
    assert a == b, f"ARMS DIFFER: {len(a)} vs {len(b)}"
    print(f"edges identical: {len(a)}")

    res = {"old": [], "new": []}
    for r in range(rounds):
        for arm, fn in (("old", old_fan), ("new", new_fan)):
            sc.setJobDescription(f"ab-fan:{arm}:r{r}")
            jobs0 = len(
                json.load(
                    urllib.request.urlopen(
                        f"{ui}/api/v1/applications/{app}/jobs"
                    )
                )
            )
            t0 = time.monotonic()
            edges_from(fn(spark, SF_DIR)).write.format("noop").mode(
                "overwrite"
            ).save()
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

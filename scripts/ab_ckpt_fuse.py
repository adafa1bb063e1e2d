"""Interleaved A/B for the r15 checkpoint+action fusion experiment.

Arms differ ONLY in the module-global `_CKPT_EAGER` toggle (True = r14
committed behavior: eager localCheckpoint job followed by the driver
action; False = fused: lazy checkpoint materialized by the action's own
job).  Both arms run in ONE session, alternating, so box weather hits
both equally.  Per run we record wall e2e (query-fn build + noop write),
the Spark job count of the run (statusTracker delta), and executor CPU
time summed over the run's stages (REST API) — the fusion's claim is
fewer jobs/passes, so job count is the primary structural evidence.

Usage: python scripts/ab_ckpt_fuse.py <query> [<query> ...] [--rounds N]
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

from migbq_spark import registry  # noqa: E402
from migbq_spark.session import RUNTIME_CONFS  # noqa: E402
from migbq_spark.operators import pipeline, training  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ui_spark():
    """get_spark() twin with the UI enabled (REST CPU metrics)."""
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS") or "*"
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-ckpt-fuse")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("MIGBQ_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "100000")
        .config("spark.ui.retainedStages", "100000")
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    return b.getOrCreate()


def _cpu_since(ui: str, app: str, first_job: int) -> float:
    """Executor CPU (s) summed over stages of jobs >= first_job."""
    try:
        jobs = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs")
        )
        stage_ids = set()
        for j in jobs:
            if j["jobId"] >= first_job:
                stage_ids.update(j["stageIds"])
        stages = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
        )
        return (
            sum(
                s.get("executorCpuTime", 0)
                for s in stages
                if s["stageId"] in stage_ids
            )
            / 1e9
        )
    except Exception:
        return float("nan")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds = 5
    for a in sys.argv[1:]:
        if a.startswith("--rounds"):
            rounds = int(a.split("=")[1])
    spark = _ui_spark()
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app = sc.applicationId
    results: dict[str, dict[str, list]] = {}
    for qid in args:
        fn = registry.QUERIES[qid]
        results[qid] = {"eager": [], "fused": []}
        for r in range(rounds):
            for arm, eager in (("eager", True), ("fused", False)):
                pipeline._CKPT_EAGER = eager
                training._CKPT_EAGER = eager
                sc.setJobDescription(f"ab:{qid}:{arm}:r{r}")
                j0 = max(sc.statusTracker().getJobIdsForGroup() or [-1]) + 1
                jobs0 = len(
                    json.load(
                        urllib.request.urlopen(
                            f"{ui}/api/v1/applications/{app}/jobs"
                        )
                    )
                )
                t0 = time.monotonic()
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                wall = time.monotonic() - t0
                jobs1 = json.load(
                    urllib.request.urlopen(
                        f"{ui}/api/v1/applications/{app}/jobs"
                    )
                )
                njobs = len(jobs1) - jobs0
                first = sorted(j["jobId"] for j in jobs1)[jobs0] if njobs else 0
                cpu = _cpu_since(ui, app, first)
                results[qid][arm].append((wall, njobs, cpu))
                print(
                    f"{qid:36s} {arm:5s} r{r} wall={wall:7.3f}s "
                    f"jobs={njobs:3d} cpu={cpu:7.2f}s",
                    flush=True,
                )
    print("\n== summary (min wall / median jobs / min cpu) ==")
    for qid, arms in results.items():
        for arm in ("eager", "fused"):
            runs = arms[arm]
            walls = sorted(w for w, _, _ in runs)
            jobs = sorted(n for _, n, _ in runs)[len(runs) // 2]
            cpus = sorted(c for _, _, c in runs)
            print(
                f"{qid:36s} {arm:5s} wall_min={walls[0]:7.3f} "
                f"jobs={jobs:3d} cpu_min={cpus[0]:7.2f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()

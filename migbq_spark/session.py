"""SparkSession factory and per-session runtime configuration.

Two paths:
- ``get_spark()`` builds a local session (tests / bench) with the configs
  an executor-cluster deployment would also want (AQE, Arrow, sane shuffle
  partitions).
- ``ensure_runtime_confs(spark)`` is called by every query on whatever
  session the driver hands us: it sets only *runtime-settable* confs that
  correctness depends on (ns-parquet mitigation, UTC session tz).  This is
  what makes the engine work on a SparkSession we didn't build.

Scale notes (100 TB): shuffle.partitions here is sized for local[32]; on a
real cluster set spark.sql.shuffle.partitions ≈ 2-3× total cores and rely
on AQE coalescing — every operator in this repo is declarative, so the
same plans re-optimize under AQE at any scale.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

#: Confs that must hold on ANY session running our queries (all are
#: runtime-settable; verified on pyspark 4.1.2).
RUNTIME_CONFS: dict[str, str] = {
    # events.ts is ns-precision parquet; Spark 4.x refuses TIMESTAMP(NANOS)
    # unless this legacy conf maps it to LongType.  catalog.load() then
    # converts with timestamp_micros(ts div 1000).  (FIXTURES.md, SURVEY §7.4.5)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB timestamps are naive; pin Spark's session tz so TimestampType
    # renders/derives identically on both sides.
    "spark.sql.session.timeZone": "UTC",
    # Arrow transfer for the pandas-UDF surface (§2.J).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Idempotently apply RUNTIME_CONFS to an externally-built session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            # Non-settable on some build => best effort; queries that need
            # it will raise a clear AnalysisException at scan time.
            pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make migbq_spark importable inside Python worker processes.

    cloudpickle serializes module-level functions referenced by UDFs *by
    reference*; an externally-built session's workers don't have this
    repo on sys.path, so without this every such UDF dies with
    ModuleNotFoundError.  Shipping the package once via addPyFile fixes
    all of them (and matches how a real cluster would deploy the code)."""
    sc = spark.sparkContext
    if getattr(sc, "_migbq_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = Path(__file__).resolve().parent
    fd, tmp = tempfile.mkstemp(suffix=".zip", prefix="migbq_spark_pkg_")
    os.close(fd)
    with zipfile.ZipFile(tmp, "w") as zf:
        for py in sorted(pkg_dir.rglob("*.py")):
            zf.write(py, arcname=str(Path("migbq_spark") / py.relative_to(pkg_dir)))
    zpath = Path(tmp).with_name("migbq_spark_pkg.zip")
    os.replace(tmp, zpath)
    sc.addPyFile(str(zpath))
    # Runtime repair for the transformWithState DRIVER-side transport
    # (r12 VERDICT "Next round" #3): StreamingPythonRunner spawns its
    # worker via PythonWorkerFactory, whose PYTHONPATH merge reads the
    # pickled function's envVars — which is ``sc.environment``, a plain
    # Python dict consulted at UDF-WRAP time (udf._wrap_function ->
    # _prepare_for_python_RDD -> sc.environment).  addPyFile includes do
    # NOT reach that spawned process, and the JVM's inherited PYTHONPATH
    # is frozen at launch — but mutating sc.environment here works on an
    # already-launched bare session because the merge happens when the
    # worker spawns.  Measured this round: a bare local[4] session that
    # previously warned STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE
    # takes the REAL transport with this set (_TWS_LAST_PATH == "real").
    # Executor-side workers also see the entry; a nonexistent path on a
    # real cluster's workers is inert (addPyFile still ships the pkg).
    repo_root = str(Path(__file__).resolve().parent.parent)
    env_pp = sc.environment.get("PYTHONPATH", "")
    if repo_root not in env_pp.split(os.pathsep):
        sc.environment["PYTHONPATH"] = (
            repo_root + (os.pathsep + env_pp if env_pp else "")
        )
    sc._migbq_pkg_shipped = True


def get_spark(
    app_name: str = "migbq-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local SparkSession with the engine's standard configuration."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("MIGBQ_SHUFFLE_PARTITIONS", "32")
    )
    # transformWithState's driver-side StreamingPythonRunner spawns a
    # fresh python process whose sys.path comes from the JVM's inherited
    # PYTHONPATH, NOT from addPyFile includes — so the repo root must be
    # on PYTHONPATH before the JVM launches for the real TWS transport
    # to unpickle our StatefulProcessor (no-op if the JVM already
    # exists; externally-built sessions rely on the operator's runtime
    # fallback instead).
    repo_root = str(Path(__file__).resolve().parent.parent)
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("MIGBQ_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

"""Migration metadata store — migbq's MigrationMetadataManager re-homed.

The reference keeps per-table progress (last migrated PK, row counts) and
a per-range job log in sqlite via peewee
(`[pub:H migbq/MigrationMetadataManager.py]`, SURVEY.md §1.1/§3.1).
Here the same two relations are small parquet tables under `meta.path`:

    progress(table_name, last_pk, n_rows, updated_run)
    job_log(table_name, range_lo, range_hi, n_rows, state, run_id)

Writes go through an atomic swap (write new → rename) so a killed run
never leaves a torn state file — the role migbq's sqlite transaction
played.  State is tiny (O(tables + ranges)): reading it back is a
metadata-only scan, never a data-scale operation.
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType()),
        T.StructField("last_pk", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("updated_run", T.StringType()),
    ]
)

JOB_LOG_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType()),
        T.StructField("range_lo", T.LongType()),
        T.StructField("range_hi", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("state", T.StringType()),  # pending | done | failed
        T.StructField("run_id", T.StringType()),
    ]
)


class MetadataStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.root = Path(path)
        self.root.mkdir(parents=True, exist_ok=True)

    # ---------------------------------------------------------- internals

    def _read(self, name: str, schema: T.StructType) -> DataFrame:
        p = self.root / name
        if not p.exists():
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(str(p))

    def _swap_write(self, df: DataFrame, name: str) -> None:
        tmp = self.root / f"_{name}.tmp.{int(time.time() * 1e6)}"
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        final = self.root / name
        if final.exists():
            shutil.rmtree(final)
        tmp.rename(final)

    # ------------------------------------------------------------- progress

    def progress(self) -> DataFrame:
        return self._read("progress", PROGRESS_SCHEMA)

    def last_pk(self, table: str) -> int | None:
        rows = self.progress().filter(F.col("table_name") == table).collect()
        return rows[0].last_pk if rows else None

    def set_progress(self, table: str, last_pk: int, n_rows: int, run_id: str) -> None:
        others = self.progress().filter(F.col("table_name") != table)
        new = self.spark.createDataFrame(
            [(table, last_pk, n_rows, run_id)], PROGRESS_SCHEMA
        )
        self._swap_write(others.unionByName(new), "progress")

    # -------------------------------------------------------------- job log

    def job_log(self) -> DataFrame:
        return self._read("job_log", JOB_LOG_SCHEMA)

    def append_jobs(self, rows: list[tuple]) -> None:
        self.append_jobs_df(self.spark.createDataFrame(rows, JOB_LOG_SCHEMA))

    def append_jobs_df(self, df: DataFrame) -> None:
        """Distributed job-log append: a plain parquet `append` write —
        O(new ranges) executor work, nothing through the driver.  At
        100 TB / 50k-row batches the log is ~10⁷ rows; the r1 design
        (collect ranges → Python list → rewrite whole log) funneled all
        of it through the driver on every run."""
        df.select(
            [F.col(f.name).cast(f.dataType) for f in JOB_LOG_SCHEMA.fields]
        ).write.mode("append").parquet(str(self.root / "job_log"))

    def missing_ranges(self, table: str) -> DataFrame:
        """migbq's retry scan: ranges recorded but never completed —
        the left_anti join of attempted vs done (SURVEY §2 `join_anti` /
        `retry_missing_ranges`)."""
        log = self.job_log().filter(F.col("table_name") == table)
        attempted = log.select("range_lo", "range_hi").distinct()
        done = (
            log.filter(F.col("state") == "done")
            .select("range_lo", "range_hi")
            .distinct()
        )
        return attempted.join(done, ["range_lo", "range_hi"], "left_anti")

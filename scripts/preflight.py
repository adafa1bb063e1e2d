"""Pre-flight the driver-graded window on a PLAIN driver-style session.

The r1 lesson: configs set by our own ``get_spark()`` builder (shuffle
partitions, AQE, Arrow) can mask behavior the driver's bare session
exhibits.  So this harness builds a session with NO engine configs at all
— exactly ``SparkSession.builder.master("local[N]")`` — and runs every
DRIVER_WINDOW query through ``migbq_spark.testing.compare_driver`` (the
driver-faithful pandas-str canonicalizer) against its DuckDB oracle at
sf0.01, the driver's t2 scale.

Since r4 it ALSO preflights the pre-staged next
rotation) as a second, informational section, so the following round's
swap is already evidenced.  Only DRIVER_WINDOW failures gate the exit
code's "do not ship" message; R5 failures are reported and counted too
(both must be fixed before their rotation lands).

Usage:  python scripts/preflight.py [out.md]
Writes a markdown log (default PREFLIGHT_r06.md) and exits non-zero if
any preflighted query fails.
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession  # noqa: E402

from migbq_spark import registry  # noqa: E402
from migbq_spark.testing import _pd_canon, compare_driver, duckdb_conn  # noqa: E402

SF_DIR = os.environ.get("PREFLIGHT_SF_DIR", "/root/testdata/sf0.01")
OUT = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "PREFLIGHT_r07.md"


def run_window(spark, con, queries, oracles, window, title, lines) -> int:
    lines += [
        f"## {title}",
        "",
        "| # | id | ok | rows | sec | detail |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    n_fail = 0
    for i, qid in enumerate(window):
        t0 = time.time()
        try:
            df = queries[qid](spark, SF_DIR)
            if qid not in oracles:
                # rows-only id: the real driver STILL canonicalizes the
                # Spark frame before recording spark_rows (pandas sort
                # over raw cells), so `df.count()` alone is NOT faithful
                # — r6 shipped two ops whose array/struct cells crashed
                # the driver's canonicalizer while preflight passed them
                # (r6 VERDICT #3).  Mirror the driver exactly:
                # toPandas() + _pd_canon, FAIL on any unsafe column.
                pdf = df.toPandas()
                _, rows, _, unsafe = _pd_canon(pdf)
                dt = time.time() - t0
                ok = not unsafe
                if not ok:
                    n_fail += 1
                lines.append(
                    f"| {i} | `{qid}` | {'PASS' if ok else '**FAIL**'} "
                    f"| {len(rows)} | {dt:.2f} | rows-only"
                    + (f" unsafe={unsafe}" if unsafe else "")
                    + " |"
                )
                print(f"{i:3d} {qid:32s} {'PASS' if ok else 'FAIL':4s} "
                      f"{len(rows):>6} rows {dt:6.2f}s (rows-only"
                      + (f", unsafe={unsafe})" if unsafe else ")"), flush=True)
                continue
            res = compare_driver(df, con, oracles[qid])
            dt = time.time() - t0
            ok = res["ok"]
            detail = ""
            if not ok:
                n_fail += 1
                detail = (
                    f"cols={res['cols_match']} count={res['count_match']} "
                    f"values={res['values_match']} unsafe={res['unsafe_cols']} "
                    f"first_diffs={res.get('first_diffs', [])[:1]}"
                )
            lines.append(
                f"| {i} | `{qid}` | {'PASS' if ok else '**FAIL**'} "
                f"| {res['spark_count']} | {dt:.2f} | {detail} |"
            )
            print(f"{i:3d} {qid:32s} {'PASS' if ok else 'FAIL':4s} "
                  f"{res['spark_count']:>6} rows {dt:6.2f}s", flush=True)
        except Exception:
            dt = time.time() - t0
            n_fail += 1
            tb = traceback.format_exc().strip().splitlines()[-1]
            lines.append(f"| {i} | `{qid}` | **ERROR** | - | {dt:.2f} | `{tb}` |")
            print(f"{i:3d} {qid:32s} ERROR {tb}", flush=True)
    lines += [
        "",
        f"**Result: {len(window) - n_fail}/{len(window)} PASS**"
        + ("" if n_fail == 0 else f" — {n_fail} FAILING, do not ship this window"),
        "",
    ]
    return n_fail


def main() -> int:
    # Bare session: intentionally NO engine configs (see module docstring).
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("preflight")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    queries = registry.queries()
    oracles = registry.oracle_sql()
    con = duckdb_conn(SF_DIR)

    lines = [
        "# PREFLIGHT — round 13 driver-window rotation (+ pre-staged r14)",
        "",
        f"Bare `local[...]` session (no engine configs), sf_dir=`{SF_DIR}`,",
        "compared via `migbq_spark.testing.compare_driver` (driver-faithful",
        "pandas-str canonicalizer).",
        "",
    ]
    n_fail = run_window(
        spark, con, queries, oracles, list(registry.DRIVER_WINDOW),
        "DRIVER_WINDOW (r14, graded this round)", lines,
    )
    n_fail += run_window(
        spark, con, queries, oracles, list(registry.R15_WINDOW),
        "R15_WINDOW (pre-staged, graded next round)", lines,
    )
    OUT.write_text("\n".join(lines))
    print(f"\nwrote {OUT} — {n_fail} total failures")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Full-registry timing sweep — catches slow outliers bench.py misses.

bench.py times only the 19 headline queries; this sweep runs EVERY
registered query once into a noop sink at $SPARK_GRAFT_SF_DIR (default
sf0.1) and prints the slowest 20.  Single-run numbers include plan/codegen
compile (~0.3-1 s), so compare queries against each other, not against
bench.py's warm min-of-3.

r3 precedent: this sweep caught dedup_minhash_lsh/portable at 82/91 s
(unblocked bucket join over the fixture's cross-source near-dup
mega-cluster → 12 M candidate pairs) while the whole rest of the registry
sat under 3.5 s.  Re-run each round after adding operators.

Since r4 (r3 VERDICT "Next round" #4) the sweep is a PER-ROUND COMMITTED
ARTIFACT with a regression gate: it writes every timing to a markdown
table, and if a previous round's artifact is given it FAILS (exit 1) when
any query exceeds GATE_FACTOR (3×) of its previous time — with a
GATE_FLOOR_S absolute floor (1.0 s) so single-run compile jitter on
sub-second queries can't trip it.  The gate's terms are documented in
BASELINE.md.

Usage: python scripts/perf_sweep.py [out.md [prev.md]]
       (defaults: PERF_SWEEP_r04.md, previous artifact = none)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from migbq_spark import registry  # noqa: E402
from migbq_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Skipped: streaming drains / external adapters / driver-loop iteration —
#: side-effecting or long-running by design, exercised in tests instead.
SKIP_PREFIX = ("stream_", "kafka_")
SKIP = {
    # streaming drains not caught by the stream_ prefix
    "pk_range_stream_sync",
    "jdbc_source", "bq_sink_adapter", "dup_connected_components",
    "dup_cc_twostar", "mm_decode_stub", "mm_frame_sample",
    "rolling_quantile_tdigest",
}


#: Regression gate (r3 VERDICT #4): fail when a query runs slower than
#: GATE_FACTOR × its previous-round time AND above GATE_FLOOR_S (absolute
#: floor absorbs single-run compile jitter on sub-second queries).
GATE_FACTOR = 3.0
GATE_FLOOR_S = 1.0


def _parse_prev(path: Path) -> dict[str, float]:
    """Read the `| qid | secs |` rows of a previous sweep artifact."""
    prev: dict[str, float] = {}
    if not path.exists():
        return prev
    for line in path.read_text().splitlines():
        parts = [p.strip() for p in line.strip().strip("|").split("|")]
        if len(parts) == 2 and parts[0].startswith("`"):
            try:
                prev[parts[0].strip("`")] = float(parts[1].rstrip("s"))
            except ValueError:
                pass
    return prev


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "PERF_SWEEP_r04.md"
    prev = _parse_prev(Path(sys.argv[2])) if len(sys.argv) > 2 else {}
    spark = get_spark("perf-sweep")
    qs = registry.queries()
    qs["agg_pk_bounds"](spark, SF_DIR).collect()  # warm-up
    # Warm spark.ml JVM class loading (~10 s one-time) so ann_ivf_topk's
    # single-run number measures the operator, not session init — same
    # rationale as the scan warm-up above (r5: trained IVF centroids).
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    _tiny = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],), ([1.0, 1.0],), ([0.5, 0.5],)],
        "e array<double>",
    ).select(array_to_vector("e").alias("features"))
    KMeans(k=2, seed=1, maxIter=1, initMode="random").fit(_tiny)
    # Warm the Python UDF worker pool: the first Python-executing query
    # in a session pays worker spawn (~1-2 s), and WHICH query that is
    # depends on registry order — r5's window rotation moved it onto
    # udtf_lateral_split, which tripped the gate at 0.33→2.2 s with no
    # code change.  Warm it here so order changes can't masquerade as
    # operator regressions.
    spark.range(4).toPandas()
    spark.range(4).groupBy().applyInPandas(
        lambda pdf: pdf, "id bigint"
    ).collect()
    times: dict[str, float] = {}
    errors: list[tuple[str, str]] = []
    skipped: list[str] = sorted(
        qid
        for qid in qs
        if qid.startswith(SKIP_PREFIX) or qid in SKIP
    )
    for qid, fn in qs.items():
        if qid.startswith(SKIP_PREFIX) or qid in SKIP:
            continue
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            times[qid] = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 - report and continue
            errors.append((qid, f"{type(e).__name__}: {e}"))
    for qid, t in sorted(times.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{qid:40s} {t:7.2f}s")
    print(f"TOTAL {sum(times.values()):.1f}s over {len(times)} queries")
    for qid, err in errors:
        print(f"ERROR {qid}: {err[:200]}")

    regressions = [
        (qid, prev[qid], t)
        for qid, t in times.items()
        if qid in prev and t > GATE_FLOOR_S and t > GATE_FACTOR * prev[qid]
    ]
    # Single-run timings on a shared box jitter by seconds (r5 observed
    # one-off 0.46→4.4 s spikes that vanished on re-run): re-time each
    # suspect once and keep the better number, so only REPRODUCIBLE
    # regressions fail the round.
    retried = []
    for qid, p, t in regressions:
        t0 = time.perf_counter()
        try:
            qs[qid](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter() - t0
        except Exception:  # noqa: BLE001 - keep the original timing
            t2 = t
        best = min(t, t2)
        times[qid] = best
        if best > GATE_FLOOR_S and best > GATE_FACTOR * p:
            retried.append((qid, p, best))
        else:
            print(f"gate retry cleared {qid}: {t:.2f}s -> {t2:.2f}s")
    regressions = retried
    lines = [
        "# PERF SWEEP — full-registry single-run timings",
        "",
        f"sf_dir=`{SF_DIR}`, noop sink, single run per query (includes",
        "plan/codegen compile ~0.3-1 s — compare across queries and across",
        f"rounds, not against bench.py's warm min-of-3).  Gate: > {GATE_FACTOR}×",
        f"previous-round time AND > {GATE_FLOOR_S} s absolute fails the round.",
        "",
        # r13 (r12 VERDICT "Next round" #4): enumerate the skipped ids in
        # the artifact so coverage is auditable without reading this file.
        f"**Skipped ({len(skipped)}/{len(qs)} registered)** — streaming"
        " drains / external adapters / driver-loop iteration,"
        " side-effecting or long-running by design, exercised in tests"
        " instead: "
        + ", ".join(f"`{q}`" for q in skipped)
        + ".",
        "",
        "| id | secs |",
        "| --- | --- |",
        *(f"| `{qid}` | {t:.2f} |" for qid, t in sorted(times.items())),
        "",
        f"**TOTAL {sum(times.values()):.1f} s over {len(times)} queries;"
        f" {len(errors)} errors; {len(regressions)} gate violations**",
        "",
    ]
    for qid, p, t in regressions:
        lines.append(f"- GATE VIOLATION `{qid}`: {p:.2f}s → {t:.2f}s ({t / p:.1f}×)")
        print(f"GATE VIOLATION {qid}: {p:.2f}s -> {t:.2f}s")
    for qid, err in errors:
        lines.append(f"- ERROR `{qid}`: {err[:200]}")
    out.write_text("\n".join(lines))
    print(f"wrote {out}")
    spark.stop()
    sys.exit(1 if errors or regressions else 0)


if __name__ == "__main__":
    main()

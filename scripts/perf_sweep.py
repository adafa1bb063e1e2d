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

Usage: python scripts/perf_sweep.py
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
    "jdbc_source", "bq_sink_adapter", "dup_connected_components",
    "dup_cc_twostar", "mm_decode_stub", "mm_frame_sample",
    "rolling_quantile_tdigest",
}


def main() -> None:
    spark = get_spark("perf-sweep")
    qs = registry.queries()
    qs["agg_pk_bounds"](spark, SF_DIR).collect()  # warm-up
    times: dict[str, float] = {}
    errors: list[tuple[str, str]] = []
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
    spark.stop()
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()

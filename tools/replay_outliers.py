"""Standalone outlier replay: separate real per-query scale regressions
from in-bench neighbor interference (r6 verdict item #8 — this replaces
the by-hand triage each round's SCALE.md section used to transcribe).

In a full bench run, a heavy query's GC/cleaner backlog inflates its
successors (measured up to 5x — see bench.py's settle comment), so a
big sf0.1->sf1 IN-BENCH ratio is ambiguous: real superlinearity or a
noisy neighbor. The discriminator is a STANDALONE replay — same data,
fresh timing, best-of-N with cache drops — of exactly the queries whose
in-bench ratio exceeds a threshold.

Usage:
    python tools/replay_outliers.py BENCH_LOCAL_r07.json BENCH_SF1_r07.json \
        [--threshold 4.0] [--reps 3] [--out SCALE_REPLAY_r07.json]

Reads the two bench records (any pair of scale factors), computes
per-query ratios over the common query set, replays every query whose
ratio exceeds the threshold at BOTH records' SF dirs, and writes one
JSON with, per query: the two in-bench times, the in-bench ratio, the
two standalone best-of-N times, and the standalone ratio — the number
SCALE.md quotes. Exit code 1 if any STANDALONE ratio still exceeds the
threshold (a real scale problem, not interference).

SF-dir resolution: sf0.1 -> /root/testdata/sf0.1 (or
$SPARK_GRAFT_SF_DIR); sf1 -> .bench/sf1 (tools/gen_scale_data.py
output, or $SPARK_GRAFT_SF1_DIR).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sf_dir(sf: float) -> str:
    if abs(sf - 1.0) < 1e-9:
        return os.environ.get("SPARK_GRAFT_SF1_DIR", ".bench/sf1")
    if abs(sf - 0.1) < 1e-9:
        return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    return f"/root/testdata/sf{sf:g}"


def _replay(spark, fn, sf_dir: str, reps: int) -> float:
    from big_data_data_lake_spark.caching import release_query_caches

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        release_query_caches()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    return round(best, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("low_record")
    ap.add_argument("high_record")
    ap.add_argument("--threshold", type=float, default=4.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    with open(args.low_record) as f:
        low = json.load(f)
    with open(args.high_record) as f:
        high = json.load(f)
    lo_q, hi_q = low["queries"], high["queries"]
    common = sorted(set(lo_q) & set(hi_q))
    outliers = [
        n
        for n in common
        if lo_q[n] > 0 and hi_q[n] / lo_q[n] > args.threshold
    ]
    print(
        f"{len(common)} common queries; {len(outliers)} in-bench ratios "
        f"> {args.threshold}: {outliers}",
        flush=True,
    )

    result = {
        "low_sf": low["sf"],
        "high_sf": high["sf"],
        "threshold": args.threshold,
        "reps": args.reps,
        "queries": {},
    }
    rc = 0
    if outliers:
        from big_data_data_lake_spark.queries import load_all
        from big_data_data_lake_spark.session import get_spark

        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark = get_spark(app_name="replay-outliers", cpus=cpus)
        registry = load_all()
        lo_dir, hi_dir = _sf_dir(low["sf"]), _sf_dir(high["sf"])
        for n in outliers:
            fn = registry[n].fn
            lo_t = _replay(spark, fn, lo_dir, args.reps)
            hi_t = _replay(spark, fn, hi_dir, args.reps)
            standalone = round(hi_t / lo_t, 2) if lo_t > 0 else None
            result["queries"][n] = {
                "bench_low": lo_q[n],
                "bench_high": hi_q[n],
                "bench_ratio": round(hi_q[n] / lo_q[n], 2),
                "standalone_low": lo_t,
                "standalone_high": hi_t,
                "standalone_ratio": standalone,
                "verdict": (
                    "scales"
                    if standalone is not None and standalone <= args.threshold
                    else "REAL_REGRESSION"
                ),
            }
            print(n, json.dumps(result["queries"][n]), flush=True)
            if result["queries"][n]["verdict"] == "REAL_REGRESSION":
                rc = 1
    out_path = args.out or "SCALE_REPLAY.json"
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}")
    return rc


if __name__ == "__main__":
    sys.exit(main())

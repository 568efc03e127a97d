"""100x (sf10) scale sweep — r8 verdict item #6: extend the 100x
evidence tier from the ~23 hand-picked flagship queries to EVERY
query above a time threshold at sf1.

For each query whose recorded sf1 bench time exceeds ``--min-sf1``
(default 1.0 s), replay standalone (best-of-N, cache-dropped, fixed
cores) at BOTH sf0.1 and sf10 and record the 100x growth ratio. On a
real cluster cores scale with data; a small multiple at
100x-data-on-fixed-cores is the strongest single-box signal that the
plan has no superlinear term. Queries that error at sf10 are recorded
with the error, not dropped.

Usage:
    python tools/sweep_sf10.py BENCH_SF1_r08.json [--min-sf1 1.0]
        [--reps 2] [--sf10-dir .bench/sf10]
        [--sf01-dir /root/testdata/sf0.1] [--out SCALE_SF10_r09.json]
        [--skip a,b,c]

Exit 0 always — adjudication (which ratios are output-bound, which
replay clean) happens in SCALE.md against this record, mirroring the
round-7 protocol.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _replay(spark, fn, sf_dir: str, reps: int) -> float:
    from big_data_data_lake_spark.caching import release_query_caches

    # Tier-faithful config (r10): shuffle partitions follow bench.py's
    # volume rule for THIS sf_dir, so sweep numbers are comparable to
    # bench records at the same tier (see replay_outliers._replay).
    # Mirror bench.py's FULL resolution order, env override included
    # (r10 advice): see replay_outliers._replay.
    from bench import _auto_shuffle_partitions

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parts = int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "0")
    ) or _auto_shuffle_partitions(sf_dir, cpus)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
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
    ap.add_argument("bench_sf1", help="BENCH_SF1 record to rank by")
    ap.add_argument("--min-sf1", type=float, default=1.0)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf10-dir", default=".bench/sf10")
    ap.add_argument("--sf01-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="SCALE_SF10.json")
    ap.add_argument("--skip", default="", help="comma list to exclude")
    args = ap.parse_args()

    from big_data_data_lake_spark.queries import load_all
    from big_data_data_lake_spark.session import get_spark

    with open(args.bench_sf1) as f:
        rec = json.load(f)
    registry = load_all()
    skip = {s.strip() for s in args.skip.split(",") if s.strip()}
    names = [
        n
        for n, t in sorted(rec["queries"].items(), key=lambda kv: -kv[1])
        if t > args.min_sf1 and n in registry and n not in skip
    ]
    print(f"{len(names)} queries > {args.min_sf1}s at sf1", flush=True)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="sweep-sf10", cpus=cpus)
    result = {
        "sf01_dir": args.sf01_dir,
        "sf10_dir": args.sf10_dir,
        "reps": args.reps,
        "min_sf1": args.min_sf1,
        "queries": {},
    }
    for i, n in enumerate(names):
        fn = registry[n].fn
        row: dict = {"sf1_bench": rec["queries"][n]}
        try:
            row["sf01"] = _replay(spark, fn, args.sf01_dir, args.reps)
            row["sf10"] = _replay(spark, fn, args.sf10_dir, args.reps)
            row["ratio_100x"] = (
                round(row["sf10"] / row["sf01"], 2) if row["sf01"] else None
            )
        except Exception as e:  # noqa: BLE001 — recorded, not hidden
            row["error"] = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
        result["queries"][n] = row
        print(
            f"[{i + 1}/{len(names)}] {n}: "
            + (
                f"sf0.1 {row.get('sf01')}s sf10 {row.get('sf10')}s "
                f"ratio {row.get('ratio_100x')}x"
                if "error" not in row
                else f"ERROR {row['error']}"
            ),
            flush=True,
        )
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}: {len(names)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

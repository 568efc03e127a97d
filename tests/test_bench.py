"""bench.py is driver-facing infrastructure: the per-round BENCH_r{N}
numbers come from running it as a script. This smoke test runs it at
the smallest SF so a broken import, a renamed headline query, or a
malformed JSON line is caught by pytest instead of costing a round."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_runs_and_emits_one_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        # the headline set is ~95 queries; the run takes ~250 s solo at
        # sf0.001 but shares cores with whatever else the box runs —
        # the margin must absorb a concurrent suite, not just noise
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    # full per-query record first, compact driver-parseable summary
    # LAST (the driver keeps only the output tail — r5 verdict item)
    assert len(lines) == 2, out.stdout[-2000:]
    payload = json.loads(lines[0])
    assert payload["metric"] == "headline_queries_total"
    assert payload["unit"] == "sec" and payload["value"] > 0
    assert payload["sf"] == 0.001
    from bench import HEADLINE

    assert set(payload["queries"]) == set(HEADLINE)
    assert all(v >= 0 for v in payload["queries"].values())
    summary = json.loads(lines[-1])
    assert summary["metric"] == "headline_queries_total"
    assert summary["value"] == payload["value"]
    assert summary["sf"] == 0.001
    assert summary["n_queries"] == len(HEADLINE)
    # compact enough to survive any sane tail window
    assert len(lines[-1]) < 200


def test_headline_plus_registry_only_partitions_the_registry():
    """Structural fix for the trailing-landing bench gap (r5 missed
    portable_hll_audit, r6 missed excision_rewrite_checksum): HEADLINE
    and the explicit REGISTRY_ONLY list (plus the audit_ prefix class)
    must EXACTLY partition the registry — registering a new query
    without placing it fails this test, so a landing can never again
    silently skip the bench records."""
    from bench import HEADLINE, REGISTRY_ONLY

    from big_data_data_lake_spark.queries import load_all

    registry = set(load_all())
    headline = set(HEADLINE)
    explicit = set(REGISTRY_ONLY)
    audits = {n for n in registry if n.startswith("audit_")}

    assert len(HEADLINE) == len(headline), "duplicate HEADLINE entry"
    assert not headline & explicit, headline & explicit
    assert not headline & audits, headline & audits
    assert not explicit & audits, explicit & audits
    missing = registry - headline - explicit - audits
    assert not missing, f"unplaced queries (add to HEADLINE or REGISTRY_ONLY): {missing}"
    stale = (headline | explicit) - registry
    assert not stale, f"bench names not in registry: {stale}"
    assert all(r in ("twin", "comp", "audit", "gated") for r in REGISTRY_ONLY.values())


def test_latest_bench_records_cover_headline_exactly():
    """The recorded BENCH_LOCAL_r{N}.json / BENCH_SF1_r{N}.json pair of
    the CURRENT round must cover HEADLINE exactly and agree with each
    other — the other half of the trailing-landing fix: a query added
    after the records were written forces a re-record (the records are
    re-writable any time via bench.py; see SCALE.md protocol). Rounds
    whose records predate this test are exempt (< r07)."""
    import glob
    import re

    from bench import HEADLINE

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = {}
    for kind in ("BENCH_LOCAL", "BENCH_SF1"):
        rounds = {}
        for p in glob.glob(os.path.join(root, f"{kind}_r*.json")):
            m = re.search(r"_r(\d+)\.json$", p)
            if m:
                rounds[int(m.group(1))] = p
        if rounds:
            n = max(rounds)
            latest[kind] = (n, rounds[n])
    assert latest, "no bench records found"
    newest_round = max(n for n, _ in latest.values())
    if newest_round < 7:
        return  # pre-contract records; first enforced round is r07
    for kind, (n, path) in latest.items():
        assert n == newest_round, f"{kind} record trails: r{n} < r{newest_round}"
        with open(path) as f:
            rec = json.load(f)
        got = set(rec["queries"])
        missing = set(HEADLINE) - got
        extra = got - set(HEADLINE)
        assert not missing, f"{path} missing headline queries: {missing}"
        assert not extra, f"{path} has non-headline queries: {extra}"

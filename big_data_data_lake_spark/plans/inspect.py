"""Parse ``df.explain("formatted")`` output into checkable facts.

Works on the final (AQE-resolved where available) physical plan text;
string-level parsing is deliberate — it checks exactly what an
operator sees when they run ``.explain`` against a production cluster,
with no dependence on private JVM APIs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_columns(df: DataFrame, table_hint: str | None = None) -> list[list[str]]:
    """Column lists actually read by each parquet scan (ReadSchema) —
    the check that a 2-column projection doesn't scan 16 columns."""
    plan = formatted_plan(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"Location:.*?(\S+)\n.*?ReadSchema: struct<(.*?)>", plan, re.S):
        loc, body = m.group(1), m.group(2)
        if table_hint and table_hint not in loc:
            continue
        cols = [f.split(":")[0].strip() for f in body.split(",") if ":" in f]
        schemas.append(cols)
    return schemas


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast joins (hash or nested-loop) in the plan."""
    plan = _simple_plan(df)
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def sort_merge_join_count(df: DataFrame) -> int:
    plan = _simple_plan(df)
    return len(re.findall(r"SortMergeJoin", plan))


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges — the scale-limiting resource."""
    plan = _simple_plan(df)
    return len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning|Exchange RoundRobinPartitioning", plan))


def has_whole_stage_codegen(df: DataFrame, execute: bool = True) -> bool:
    """True if any pipeline compiled into whole-stage codegen
    (``[codegen id : N]`` annotations in the formatted plan).

    Under AQE the codegen annotations only materialize in the *final*
    plan, so by default the query is executed first (collect on the
    same QueryExecution)."""
    if execute and "codegen id" not in formatted_plan(df):
        df.collect()
    return "codegen id" in formatted_plan(df)


# Plan antipatterns: the shapes that do not survive a 100 TB input.
# - cartesian / broadcast-nested-loop: O(n*m) pair fan-out in
#   different clothes. Legitimate ONLY when one side is provably tiny
#   (a broadcast literal / scalar frame) — allowlist those queries.
# - unpartitioned window: Window fed by an Exchange SinglePartition
#   funnels every row through one task (the round-2 scale-killer).
#   A SinglePartition exchange under a global AGGREGATE is fine (it
#   moves one partial row per partition), so the check requires the
#   Window->Sort->Exchange SinglePartition chain, not the exchange
#   alone.
_UNPARTITIONED_WINDOW_RE = re.compile(
    r"Window[^\n]*\n(?:[^\n]*\n){0,2}?[^\n]*Exchange SinglePartition"
)


# Tables whose volume scales with the corpus: broadcasting one of
# these UNREDUCED (no filter, no aggregate, no join shrinking it
# first) is a plan that dies on a 100 TB fact side no matter what a
# box-tuned autoBroadcastJoinThreshold thinks (round-9 catch: the
# optimizer broadcast a 2-column lineitem projection into a semi
# join under the local 256 MB threshold).
FACT_TABLES = ("lineitem", "orders", "events", "documents", "embeddings")

def fact_broadcast_findings(df: DataFrame) -> list[str]:
    """Names of fact tables whose UNREDUCED scan feeds a
    BroadcastExchange: the subtree below the exchange contains a scan
    of a fact table but NO Filter / Join / Aggregate node — i.e. the
    broadcast build is the raw (possibly projected) fact table.
    Filtered or pre-aggregated builds (a HAVING survivor set, a
    type-filtered part dim) never fire."""
    return fact_broadcast_findings_in_plan(_simple_plan(df))


def fact_broadcast_findings_in_plan(plan: str) -> list[str]:
    """String-level core of :func:`fact_broadcast_findings`, split out
    so fixture plans (e.g. a root-position BroadcastExchange, which no
    local query produces) can be linted directly in tests."""
    lines = plan.splitlines()

    def depth(line: str) -> int:
        """Tree depth = column of the node marker. A line with no
        '+-'/':-' marker (root-position node, ReusedExchange
        formatting) is depth 0 — as a CHILD comparison that is right:
        falling through as -1 would let the subtree walk below a root
        BroadcastExchange swallow the whole remaining plan, where any
        unrelated Join/Aggregate masks the finding (round-9 advice)."""
        m = re.search(r"[+:]-", line)
        if m:
            return m.start()
        stripped = len(line) - len(line.lstrip(" :"))
        return stripped  # leading-whitespace width; 0 at the root

    def anchor_depth(line: str) -> int:
        """Depth used for the exchange line that ANCHORS a subtree
        walk. A marker-less root-position exchange sits at column 0,
        but so do its children's '+-' markers; anchoring at 0 would
        end the walk before the first child and silently skip an
        unreduced fact scan directly beneath it (round-10 advice —
        false negative, the opposite failure of the child case
        above). Anchor one level shallower instead; the -1 walk then
        terminates at the first marker-less depth-0 line (a new
        section header / root sibling — see the r11-advice guard in
        the walk below), not only at depth <= -1, which no tree line
        ever reaches."""
        m = re.search(r"[+:]-", line)
        return m.start() if m else -1

    findings: list[str] = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = anchor_depth(line)
        subtree = []
        for nxt in lines[i + 1 :]:
            if not nxt.strip():
                continue  # blank separator, not a tree node
            has_marker = re.search(r"[+:]-", nxt) is not None
            if d == -1 and not has_marker and depth(nxt) == 0:
                # r11 advice: with a -1 anchor no tree depth is <= d,
                # so without this the walk swallows everything after a
                # root-position exchange — a later marker-less section
                # header's unrelated Join/Aggregate would mask the
                # finding (the same masking mode the round-9 fix
                # closed for child positions). A marker-less depth-0
                # line mid-plan is a section boundary, never a child.
                break
            if depth(nxt) <= d:
                break
            subtree.append(nxt)
        sub = "\n".join(subtree)
        if re.search(r"Join|Aggregate|TakeOrdered|Limit", sub):
            continue
        # a Filter counts as a reduction only if it is SELECTIVE —
        # bare isnotnull() guards that Spark inserts for join keys
        # don't shrink a fact table
        selective = False
        for fl in re.finditer(r"Filter (.+)", sub):
            residue = re.sub(r"isnotnull\([^)]*\)", "", fl.group(1))
            residue = re.sub(r"\bAND\b|[()\s]", "", residue)
            if residue:
                selective = True
                break
        if selective:
            continue
        for t in FACT_TABLES:
            if f"/{t}.parquet" in sub or re.search(
                rf"Scan parquet[^\n]*[/ ]{t}\b", sub
            ):
                findings.append(t)
    return findings


def lint_plan(df: DataFrame, allow: set[str] | frozenset[str] = frozenset()) -> list[str]:
    """Scan a plan for scale antipatterns; returns finding names
    (empty = clean). ``allow`` suppresses findings a query has a
    documented bounded-input justification for."""
    plan = formatted_plan(df)
    findings = []
    if "cartesian-product" not in allow and "CartesianProduct" in plan:
        findings.append("cartesian-product")
    if (
        "broadcast-nested-loop-join" not in allow
        and "BroadcastNestedLoopJoin" in plan
    ):
        findings.append("broadcast-nested-loop-join")
    if "unpartitioned-window" not in allow and _UNPARTITIONED_WINDOW_RE.search(plan):
        findings.append("unpartitioned-window")
    if "fact-broadcast" not in allow:
        facts = fact_broadcast_findings(df)
        if facts:
            findings.append(f"fact-broadcast:{','.join(sorted(set(facts)))}")
    return findings

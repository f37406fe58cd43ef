"""Registry-wide STATIC plan census — the scale audit for every
``queries()`` gate, not just the bench suite (tools/plan_audit.py
executes the bench queries and records AQE-final plans + scheduler
counts; this builds every gate's plan LAZILY and censuses the
pre-AQE physical plan, so the whole 247-gate registry is covered in
minutes with zero data read).

Per gate: Exchange / SortMergeJoin / BroadcastHashJoin /
BroadcastNestedLoopJoin+CartesianProduct / WindowExec counts, plus
two red-flag columns:

- ``global_win``: WindowExec nodes with an EMPTY partition spec —
  the single-task-at-any-scale shape. Legitimate only on bounded
  (post-limit / dimension-sized) frames; every occurrence is listed
  so each has to be justified, not discovered in production.
- ``cartesian``: BNLJ/CartesianProduct nodes. In this repo every
  expected one is a ``crossJoin(broadcast(<1-row scalar>))``
  constant-attach; anything else is a bug.

Streaming gates and gates that must EXECUTE to build (two-phase
ranking offsets, driver-trained models, bounded-probe dispatchers)
are censused too — the probe/offset actions they run at plan-build
time are part of their documented cost — but a ``--lazy-only`` flag
skips them for a pure no-execution sweep.

Caveat: the census is STATIC — persisted frames that feed multiple
consumers appear as duplicated subtrees (their exchanges counted per
reference), while at runtime the persist computes them once. High
exchange counts on gates built around a `.persist()` hub (e.g.
vocab_coverage's ranked-vocabulary reuse) are a static-count
artifact, not a runtime cost.

``--strict`` turns the unpartitioned-window check into a regression
GATE: exit 1 if any gate outside the documented allowlist carries a
global window. Add to the allowlist ONLY with a docstring
justification on the operator (bounded-by-construction frame).

Writes PLAN_CENSUS.md and prints one JSON summary line.

Usage: python tools/plan_census.py [sf_dir] [--lazy-only] [--strict]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# gates whose plan BUILD runs Spark jobs (documented construction
# cost: bounded probes, offset collects, driver-local training) or
# starts a stream — skipped under --lazy-only
EXECUTES_ON_BUILD_PREFIXES = ("stream_",)

# gates ALLOWED to carry an unpartitioned window — every entry is a
# bounded-by-construction frame, justified in the operator docstring
# it points at (month spine; post-top-N rank attaches)
GLOBAL_WINDOW_ALLOWLIST = frozenset(
    {
        "monthly_revenue_change_orders",  # post-agg month spine
        "rrf_hybrid_documents",  # retrieval.attach_rank post-top-50
        "chi2_token_label_documents",  # rank attach post-limit-30
        "pmi_collocations_documents",  # rank attach post-limit-50
    }
)


def _counts(plan: str) -> dict:
    n = lambda pat: len(re.findall(pat, plan))  # noqa: E731
    # WindowExec detail lines: "Window [..spec..], [part..], [order..]"
    # an empty partition spec renders as "Window [..], [..]" with only
    # two bracket groups — detect via 'Window [' lines lacking a
    # partitionBy group
    # A window is GLOBAL iff its windowspecdefinition has no
    # partition columns. In the rendered spec the partition columns
    # come FIRST without a sort direction; so the spec is global when
    # its first argument is the frame itself (no partition, no order)
    # or carries ASC/DESC (order columns only).
    global_win = 0
    for m in re.finditer(
        r"^[\s:+|*-]*(?:\(\d+\)\s*)?Window\s+\[", plan, re.M
    ):
        line = plan[m.start(): plan.find("\n", m.start())]
        spec = re.search(r"windowspecdefinition\(([^,)]+)", line)
        if not spec:
            continue
        first = spec.group(1).strip()
        if (
            first.startswith("specifiedwindowframe")
            or " ASC" in first
            or " DESC" in first
        ):
            global_win += 1
    return {
        "exchanges": n(r"Exchange (?:hash|range)partitioning"),
        "single_part_exchange": n(r"Exchange SinglePartition"),
        "smj": n(r"SortMergeJoin"),
        "bhj": n(r"BroadcastHashJoin"),
        "bnlj": n(r"BroadcastNestedLoopJoin") + n(r"CartesianProduct"),
        "window": n(r"\bWindow\b"),
        "global_win": global_win,
    }


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    lazy_only = "--lazy-only" in sys.argv[1:]
    strict = "--strict" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from job_post_similarity_spark.session import get_spark

    spark = get_spark("plan-census", cpus=8)
    rows = []
    skipped = []
    for name, fn in entrymod.queries().items():
        if lazy_only and name.startswith(EXECUTES_ON_BUILD_PREFIXES):
            skipped.append(name)
            continue
        if name.startswith("stream_"):
            # stream twins execute a full run on build; census the
            # batch oracle side instead (their stateful plans are
            # covered by the streaming tests)
            skipped.append(name)
            continue
        try:
            spark.catalog.clearCache()
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
        except Exception as e:  # noqa: BLE001
            rows.append({"query": name, "error": str(e)[:120]})
            continue
        rows.append({"query": name, **_counts(plan)})

    flagged_gw = [
        r["query"] for r in rows if r.get("global_win", 0) > 0
    ]
    flagged_err = [r["query"] for r in rows if "error" in r]
    with open(os.path.join(REPO, "PLAN_CENSUS.md"), "w") as f:
        f.write(
            "# PLAN_CENSUS — static physical-plan census of every "
            "queries() gate\n\n"
            f"sf_dir: `{sf_dir}` — regenerated by "
            "`tools/plan_census.py` (pre-AQE plans, built lazily; "
            "streaming twins skipped — their batch oracles are "
            "censused).\n\n"
            "`global_win` counts WindowExec nodes with an empty\n"
            "partition spec (single-task at any scale). Every nonzero\n"
            "entry must correspond to a documented bounded frame\n"
            "(post-limit rank attach, dimension-sized spine, scalar\n"
            "aggregate) — see the operator docstring it points at.\n\n"
            "| query | exchanges | 1-part ex | SMJ | BHJ | BNLJ/cart |"
            " windows | global win |\n"
            "|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            if "error" in r:
                f.write(f"| {r['query']} | build error: {r['error']} |"
                        " | | | | | |\n")
                continue
            f.write(
                f"| {r['query']} | {r['exchanges']} |"
                f" {r['single_part_exchange']} | {r['smj']} |"
                f" {r['bhj']} | {r['bnlj']} | {r['window']} |"
                f" {r['global_win']} |\n"
            )
        if flagged_gw:
            f.write(
                "\n## Gates with unpartitioned windows (each must be "
                "bounded-by-construction)\n\n"
            )
            for q in flagged_gw:
                f.write(f"- {q}\n")
    unlisted = sorted(set(flagged_gw) - GLOBAL_WINDOW_ALLOWLIST)
    print(
        json.dumps(
            {
                "metric": "plan_census",
                "gates": len(rows),
                "skipped_streaming": len(skipped),
                "build_errors": flagged_err,
                "global_window_gates": flagged_gw,
                "unlisted_global_windows": unlisted,
            }
        )
    )
    if strict and (unlisted or flagged_err):
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

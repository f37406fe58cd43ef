"""Per-query bench profile: where does each headline row's time go?

For every HEADLINE query (or the names passed on argv), measures
separately, in bench-identical conditions (same session factory, same
warm-up, same min-of-3 discipline):

- ``t_plan``: wall-clock of the builder call ``qs[name](spark, sf_dir)``
  alone — driver-side Python + py4j plan construction (bench pays this
  inside its timed region every run);
- ``t_run1/2/3``: builder + count() per run (run1 warms fixture memos /
  shuffle files; min over the three is what bench records);
- ``jobs/stages/tasks`` for the LAST run (warm), via StatusTracker.

Usage: python tools/bench_profile.py [--sf DIR] [name ...]
Prints one JSON line per query plus a sorted summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]

    from bench import HEADLINE

    import __spark_entry__ as entrymod
    from job_post_similarity_spark.session import get_spark

    names = args or HEADLINE
    spark = get_spark("bench-profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = entrymod.queries()
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()

    out = []
    for name in names:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir)
        t_plan = time.time() - t0
        runs = []
        plans = []
        jobs = stages = tasks = 0
        for i in range(3):
            group = f"profile-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.count()
            plans.append(round(t1 - t0, 3))
            runs.append(round(time.time() - t0, 3))
            sc.setJobGroup("", "")
            jids = tracker.getJobIdsForGroup(group)
            stage_ids = set()
            for j in jids:
                info = tracker.getJobInfo(j)
                if info:
                    stage_ids.update(info.stageIds)
            jobs, stages = len(jids), len(stage_ids)
            tasks = sum(
                tracker.getStageInfo(s).numTasks
                for s in stage_ids
                if tracker.getStageInfo(s)
            )
        rec = {
            "query": name,
            "t_plan": round(t_plan, 3),
            "runs": runs,
            "plans": plans,
            "best": min(runs),
            "jobs": jobs,
            "stages": stages,
            "tasks": tasks,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)

    out.sort(key=lambda r: -r["best"])
    print("== slowest (best-of-3) ==")
    for r in out[:15]:
        print(
            f"{r['query']:45s} best={r['best']:6.3f} "
            f"plan={r['t_plan']:6.3f} jobs={r['jobs']:3d} "
            f"stages={r['stages']:3d} tasks={r['tasks']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

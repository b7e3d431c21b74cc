"""Per-stage decomposition of single registry keys (guide §1.1/§7.1).

Runs each key once warm at $SPARK_GRAFT_SF_DIR with the UI enabled,
then reads /api/v1 stage metrics for the jobs the timed run launched
and prints the heaviest stages (executor run time, shuffle bytes,
input bytes, task count) — the empirical "where is the time going"
loop without a browser.

Usage: SPARK_GRAFT_UI=true python tools/stage_profile.py <key> [key ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    os.environ.setdefault("SPARK_GRAFT_UI_RETAINED", "5000")
    keys = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from pypers_spark.session import get_session

    spark = get_session("pypers_spark-stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    host = (
        f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
        if spark.sparkContext.uiWebUrl
        else "http://localhost:4040"
    )
    app_id = spark.sparkContext.applicationId

    warm_sf = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    for k in keys:
        qs[k](spark, warm_sf).write.format("noop").mode("overwrite").save()
        # warm run at the bench SF too so persisted artifacts exist and
        # the profiled run matches the bench's min-of-3 steady state
        qs[k](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for k in keys:
        df = qs[k](spark, sf_dir)
        before = {s["stageId"] for s in _get(f"{host}/api/v1/applications/{app_id}/stages")}
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        stages = [
            s
            for s in _get(f"{host}/api/v1/applications/{app_id}/stages")
            if s["stageId"] not in before
        ]
        total_exec_ms = sum(s.get("executorRunTime", 0) for s in stages)
        # executorRunTime includes broadcast/fetch WAIT; executorCpuTime
        # (ns) is the on-CPU truth — print both so fixed-overhead-bound
        # stages aren't mistaken for compute-bound ones (guide §1.1).
        total_cpu_ms = sum(s.get("executorCpuTime", 0) for s in stages) / 1e6
        print(f"\n=== {k}: wall={wall:.3f}s  n_stages={len(stages)} "
              f"run_total={total_exec_ms/1000:.2f}s cpu_total={total_cpu_ms/1000:.2f}s")
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        for s in stages[:12]:
            print(
                f"  stage {s['stageId']:>5} {s['status']:<9} tasks={s.get('numCompleteTasks',0):>3} "
                f"run={s.get('executorRunTime',0)/1000:6.2f}s "
                f"cpu={s.get('executorCpuTime',0)/1e9:6.2f}s "
                f"in={s.get('inputBytes',0)>>20:4d}MB "
                f"sr={s.get('shuffleReadBytes',0)>>10:6d}KB sw={s.get('shuffleWriteBytes',0)>>10:6d}KB "
                f"| {s.get('description') or s.get('name','')[:80]}"
            )


if __name__ == "__main__":
    main()

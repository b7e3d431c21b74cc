"""Time individual registry keys: warm once at sf0.001, then best-of-N
noop-sink writes at $SPARK_GRAFT_SF_DIR (same methodology as bench.py,
isolated to the keys under study so a profiling loop doesn't pay the
whole 160-key sweep).

Usage: python tools/profile_key.py <key> [key ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_PROFILE_RUNS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    keys = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))

    import __spark_entry__ as e
    from pypers_spark.session import get_session

    spark = get_session("pypers_spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    unknown = [k for k in keys if k not in qs]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")

    warm_sf = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_sf):
        warm_sf = sf_dir
    for k in keys:
        qs[k](spark, warm_sf).write.format("noop").mode("overwrite").save()

    out = {}
    for k in keys:
        runs = []
        for _ in range(n_runs):
            df = qs[k](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[k] = {"best": min(runs), "runs": runs}
        print(json.dumps({k: out[k]}), flush=True)
    print(json.dumps({"total_best": round(sum(v["best"] for v in out.values()), 3),
                      "load_avg": round(os.getloadavg()[0], 2)}))


if __name__ == "__main__":
    main()

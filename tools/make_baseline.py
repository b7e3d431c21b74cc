"""Generate BASELINE_LOCAL.json — DuckDB oracle wall-times per headline query.

The round criterion is "BENCH within 2x of BASELINE at the same scale
factor", but no numeric baseline was ever published. This script creates
one that is measurable on THIS box: it times each headline query's own
DuckDB oracle SQL (the exact SQL the correctness gate trusts) at the
bench scale factor, single-node, all cores — i.e. the best
state-of-the-art single-node engine running the identical workload on
identical data. bench.py then emits spark/duckdb ratios per query.

Usage:  python tools/make_baseline.py  [writes BASELINE_LOCAL.json]
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import CALIBRATION, HEADLINE, SF_DIR


def main() -> None:
    from pypers_spark.operators import ORACLES
    from pypers_spark.sources.registry import TABLES

    # Same load gate as tools/pin_baseline_keys.py: baselines timed on a
    # busy box poison every later ratio comparison.
    max_load = float(os.environ.get("SPARK_GRAFT_PIN_MAX_LOAD", "8"))
    load = os.getloadavg()[0]
    if load > max_load:
        raise SystemExit(
            f"refusing to time baseline at load_avg {load:.1f} > {max_load} "
            "(set SPARK_GRAFT_PIN_MAX_LOAD to override)"
        )

    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )

    # Warm once (buffer-pool + parquet metadata), then time.
    times: dict[str, float] = {}
    skipped: list[str] = []
    for name in HEADLINE + tuple(CALIBRATION):
        sql = ORACLES.get(name)
        if sql is None:
            skipped.append(name)
            continue
        con.sql(sql).fetchall()
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"{name}: {times[name]}s", file=sys.stderr)

    sf = float(os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf") or "0.1")
    out = {
        "engine": "duckdb",
        "engine_version": duckdb.__version__,
        "threads": os.cpu_count(),
        "sf": sf,
        "note": (
            "Wall time of each headline query's DuckDB oracle SQL on this "
            "box (warm, second run). bench.py emits spark/duckdb ratios "
            "against these numbers when sf matches."
        ),
        "queries": times,
        "total_sec": round(sum(times.values()), 3),
        "skipped": skipped,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE_LOCAL.json") if os.path.basename(os.getcwd()) == "tools" else "BASELINE_LOCAL.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({"baseline_total_sec": out["total_sec"], "n": len(times)}))


if __name__ == "__main__":
    main()

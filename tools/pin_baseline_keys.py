"""Incrementally pin DuckDB oracle wall-times for SPECIFIC headline keys
into BASELINE_LOCAL.json (tools/make_baseline.py re-times everything —
~12 min of DuckDB at sf0.1; this merges just the new keys).

Usage:  python tools/pin_baseline_keys.py key1 key2 ...
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import SF_DIR

BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BASELINE_LOCAL.json",
)


def main() -> None:
    from pypers_spark.operators import ORACLES
    from pypers_spark.sources.registry import TABLES

    keys = sys.argv[1:]
    if not keys:
        raise SystemExit("pass the headline keys to pin")
    # Load gate: a baseline pinned on a busy box under-reports DuckDB
    # and flatters every later Spark/DuckDB ratio. Refuse rather than
    # record a poisoned number (override: SPARK_GRAFT_PIN_MAX_LOAD).
    max_load = float(os.environ.get("SPARK_GRAFT_PIN_MAX_LOAD", "8"))
    load = os.getloadavg()[0]
    if load > max_load:
        raise SystemExit(
            f"refusing to pin baseline at load_avg {load:.1f} > {max_load} "
            "(set SPARK_GRAFT_PIN_MAX_LOAD to override)"
        )
    con = duckdb.connect()
    for name in TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'")
    with open(BASE) as f:
        out = json.load(f)
    sf = float(os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf") or "0.1")
    assert out["sf"] == sf, f"baseline sf {out['sf']} != bench sf {sf}"
    single = os.environ.get("PIN_SINGLE_RUN") == "1"  # for multi-minute
    # oracles (recursive-CTE dedup chains) where warm+timed would blow
    # the tool timeout; cold-vs-warm differs little at this input size
    for name in keys:
        sql = ORACLES[name]
        if not single:
            con.sql(sql).fetchall()  # warm
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        out["queries"][name] = round(time.perf_counter() - t0, 3)
        print(f"{name}: {out['queries'][name]}s", file=sys.stderr)
    out["total_sec"] = round(sum(out["queries"].values()), 3)
    with open(BASE, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({"baseline_total_sec": out["total_sec"], "n": len(out["queries"])}))


if __name__ == "__main__":
    main()

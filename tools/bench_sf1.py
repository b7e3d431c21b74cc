"""Same-SF Spark-vs-DuckDB bench at sf1 — the fixed-overhead proof.

The per-key perf story since r8 has been: most headline keys read
slower than their DuckDB oracle at sf0.1 because a sub-second Spark
plan pays a fixed ~0.3-0.6 s local[32] job-dispatch tax against a
millisecond DuckDB wall, and that tax AMORTIZES as data grows while
DuckDB's wall grows with the data. The r9 verdict (next-round item #1)
asked for that claim to be MEASURED, not argued: bench the heaviest
headline keys at a 10x larger scale factor against their own DuckDB
oracles on the SAME tables and show the per-key ratios collapsing
toward (or below) 1.

sf1 fixture: 10x replicas of the sf0.1 driver tables with the
tools/scale_check.py per-copy KEY REMAPPING (block/source/label/user
keys shift per copy so block WIDTH stays constant while block COUNT
grows — the production blocking discipline; naive concatenation would
widen every block and measure quadratic blowup no real corpus has).
Deterministic: DuckDB SQL over the committed sf0.1 parquet, no RNG.

Per key this artifact records: Spark wall (steady-state best-of-3,
noop sink, plan built outside the timer — bench.py methodology),
DuckDB oracle wall (warm, best-of-2 timed second run —
tools/make_baseline.py methodology), the sf1 ratio, and the committed
sf0.1 ratio from BENCH_DETAILS.json for the same key, so the collapse
is visible per-row. Oracles that exceed the timeout are interrupted
and recorded as lower bounds (ratio becomes an upper bound).

Usage: python tools/bench_sf1.py [round_tag] [n_keys]
Writes replicas to /tmp/sf1_bench/ (off-repo) and the artifact to
BENCH_SF1_<round_tag>.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = "/tmp/sf1_bench"
ORACLE_TIMEOUT_S = float(os.environ.get("SPARK_GRAFT_SF1_ORACLE_TIMEOUT", "900"))


def pick_heaviest(n: int) -> list[str]:
    """Top-n headline keys by committed sf0.1 Spark wall (BENCH_DETAILS
    'queries' — headline only: calibration demos are documented
    quadratic-in-block variants whose oracles go quadratic too)."""
    with open(os.path.join(REPO, "BENCH_DETAILS.json")) as fh:
        detail = json.load(fh)
    times = detail["queries"]
    return [k for k, _ in sorted(times.items(), key=lambda kv: -kv[1])[:n]]


def timed_oracle(con, sql: str) -> tuple[float | None, bool, str | None]:
    """(wall_sec of warm run, timed_out, error). Warm once, time the
    second run; either run is interrupted at ORACLE_TIMEOUT_S and
    reported as a lower bound. A DuckDB ERROR (as opposed to an
    interrupt we issued) is NOT a timeout: it comes back as the third
    element so the caller records it instead of clamping duck_sec to
    the cap and inflating duck_total."""

    def run() -> float:
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        return time.perf_counter() - t0

    def with_timeout(fn):
        """(value | None, err | None); value None + err None == timeout."""
        out: dict = {}

        def target():
            try:
                out["v"] = fn()
            except Exception as exc:  # interrupt surfaces as an exception
                out["err"] = str(exc)

        th = threading.Thread(target=target, daemon=True)
        th.start()
        th.join(ORACLE_TIMEOUT_S)
        if th.is_alive():
            con.interrupt()
            th.join(60)
            return None, None
        return out.get("v"), out.get("err")

    warm, err = with_timeout(run)
    if err is not None:
        return None, False, err
    if warm is None:
        return ORACLE_TIMEOUT_S, True, None
    timed, err = with_timeout(run)
    if err is not None:
        return None, False, err
    if timed is None:
        return ORACLE_TIMEOUT_S, True, None
    return round(timed, 3), False, None


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r10"
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 28

    import duckdb

    import __spark_entry__ as e
    from pypers_spark.session import get_session
    from pypers_spark.sources.registry import TABLES
    from tools.scale_check import gen

    if not os.path.exists(f"{SF1_DIR}/events.parquet"):
        print("generating sf1 (10x sf0.1, key-remapped)...", file=sys.stderr)
        gen(10, SF1_DIR)

    keys = pick_heaviest(n_keys)
    print(f"keys ({len(keys)}):", keys, file=sys.stderr)

    spark = get_session("pypers_spark-bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    osql = e.oracle_sql(SF1_DIR)

    # Warm JIT/codegen on the small fixture first (bench.py discipline).
    warm_sf = "/root/testdata/sf0.001"
    for k in keys:
        qs[k](spark, warm_sf).write.format("noop").mode("overwrite").save()

    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF1_DIR}/{name}.parquet'"
        )

    # Carry the committed sf0.1 per-key ratios for the same keys.
    sf01_ratio: dict[str, float] = {}
    with open(os.path.join(REPO, "BENCH_DETAILS.json")) as fh:
        sf01_ratio = json.load(fh).get("ratios", {})

    # Job-dispatch floor on this session (bench.py item #6 discipline):
    # best-of-5 noop write of a 1-row range — the fixed cost any plan
    # pays. Per-key floor_share makes >2x ratios on small absolute
    # walls self-describing.
    floor_runs = []
    for _ in range(5):
        df0 = spark.range(1)
        t0 = time.perf_counter()
        df0.write.format("noop").mode("overwrite").save()
        floor_runs.append(time.perf_counter() - t0)
    floor_sec = round(min(floor_runs), 3)

    rows: dict[str, dict] = {}
    load_start = round(os.getloadavg()[0], 2)
    for k in keys:
        spark_runs = []
        for _ in range(3):
            df = qs[k](spark, SF1_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            spark_runs.append(round(time.perf_counter() - t0, 3))
        duck_wall, timed_out, duck_err = timed_oracle(con, osql[k])
        spark_wall = min(spark_runs)
        rows[k] = {
            "spark_sec": spark_wall,
            "spark_runs": spark_runs,
            "duck_sec": duck_wall,
            "duck_timed_out": timed_out,
            "ratio_sf1": round(spark_wall / duck_wall, 3) if duck_wall else None,
            "ratio_sf01": sf01_ratio.get(k),
            "floor_share": round(min(floor_sec / spark_wall, 1.0), 3)
            if spark_wall > 0
            else 1.0,
        }
        if duck_err is not None:
            # A DuckDB ERROR is not a timeout (r10 advisory): record it
            # and exclude the key from duck_total instead of clamping
            # duck_sec to the cap.
            rows[k]["error"] = duck_err
        if timed_out:
            rows[k]["note"] = (
                f"oracle interrupted at {ORACLE_TIMEOUT_S}s — duck_sec is a "
                "lower bound, ratio an upper bound"
            )
        print(f"{k}: spark={spark_wall}s duck={duck_wall}s"
              f"{' (TIMEOUT)' if timed_out else ''}"
              f"{' (ORACLE ERROR)' if duck_err else ''}", flush=True)

    improved = sum(
        1
        for r in rows.values()
        if r["ratio_sf01"] is not None
        and r["ratio_sf1"] is not None
        and (r["ratio_sf1"] < r["ratio_sf01"] or r["duck_timed_out"])
    )
    comparable = sum(1 for r in rows.values() if r["ratio_sf01"] is not None)
    ok_rows = [r for r in rows.values() if r["duck_sec"] is not None]
    spark_total = round(sum(r["spark_sec"] for r in ok_rows), 2)
    duck_total = round(sum(r["duck_sec"] for r in ok_rows), 2)
    out = {
        "sf": 1.0,
        "fixture": (
            "10x key-remapped replicas of /root/testdata/sf0.1 "
            "(tools/scale_check.py gen, block width constant)"
        ),
        "methodology": (
            "spark: steady-state best-of-3 noop write, plan built outside "
            "timer; duck: warm then timed second run of the key's own "
            "oracle SQL on the same parquet"
        ),
        "load_avg_start": load_start,
        "load_avg_end": round(os.getloadavg()[0], 2),
        "floor_sec": floor_sec,
        "n_oracle_errors": sum(1 for r in rows.values() if "error" in r),
        "n_keys": len(rows),
        "n_ratio_improved_vs_sf01": improved,
        "n_comparable": comparable,
        "spark_total_sec": spark_total,
        "duck_total_sec": duck_total,
        "aggregate_ratio_sf1": round(spark_total / duck_total, 4) if duck_total else None,
        "queries": rows,
    }
    path = os.path.join(REPO, f"BENCH_SF1_{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({k: out[k] for k in (
        "n_keys", "n_ratio_improved_vs_sf01", "n_comparable",
        "spark_total_sec", "duck_total_sec", "aggregate_ratio_sf1",
    )}))


if __name__ == "__main__":
    main()

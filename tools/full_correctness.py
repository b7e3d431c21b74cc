"""Full-registry Spark-vs-DuckDB correctness sweep.

The per-round driver samples ~50 of the registry's queries; this tool
runs the SAME comparator (tests/oracle_check.py — row count, schema,
order-insensitive value comparison) over EVERY ``queries()`` key and
writes a driver-schema artifact so each round leaves a machine-readable
all-keys correctness record in-repo.

Usage:  python tools/full_correctness.py [round_tag] [sf_dir]
Writes: CORRECTNESS_FULL_<round_tag>.json  (default tag: r05)

Row schema matches the driver's CORRECTNESS_r{N}.json:
  {key: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
         err}}
Keys without an oracle_sql entry (non-SQL-expressible ops) get the
driver's weaker rows-only record: hash_match null, err "no-oracle".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Per-key wall adjudications (r10 verdict item #4): keys whose sweep
# wall is dominated by a one-time shared-artifact build or plan
# compile, not per-row compute — the note rides in the artifact so the
# number is self-describing. Steady-state walls measured best-of-3 in
# a warm session at sf0.1.
WALL_NOTES = {
    "ann_graph_search": (
        "single-shot wall pays the shared cell-kNN graph build "
        "(tracked_persist 'similarity.gs_edges'; first caller in the "
        "alphabetical sweep) plus its codegen JIT; steady-state serving "
        "wall is 0.86s best-of-3 at sf0.1"
    ),
    "ann_knn_graph": (
        "documented quadratic-in-block calibration demo (production "
        "twin ann_knn_graph_cells); wall is the label-block pairwise "
        "build, steady-state 2.6s best-of-3 at sf0.1"
    ),
}


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r05"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    # Optional key filter (argv[3:]): run only these registry keys and
    # skip the artifact write — targeted re-verification, not evidence.
    only = set(sys.argv[3:])

    import __spark_entry__ as e
    from pypers_spark.session import get_session
    from tests.oracle_check import compare, duck_connection

    spark = get_session("pypers_spark-full-correctness")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    # dynamic oracles (op_file_stats) interpolate the sweep's sf_dir —
    # passed explicitly so the oracle reads the sweep's own tables even
    # if the env var points elsewhere.
    qs, osql = e.queries(), e.oracle_sql(sf_dir)
    if only:
        unknown = only - set(qs)
        if unknown:
            sys.exit(f"unknown keys: {sorted(unknown)}")
        qs = {k: qs[k] for k in only}

    out: dict[str, dict] = {}
    t0 = time.perf_counter()
    for k in sorted(qs):
        row = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            # wall of the full Spark-vs-oracle compare for this key (a
            # committed per-key cost record for every registry key, not
            # just the bench headline set — r7 verdict item #4); split
            # into the two engines since r9 (r8 verdict item #6) so the
            # heaviest rows read as what they are — e.g. dd_soft_weights'
            # 411 s was almost entirely its recursive-CTE DuckDB oracle,
            # not Spark cost.
            "wall_sec": None,
            "spark_wall_sec": None,
            "oracle_wall_sec": None,
        }
        tk = time.perf_counter()
        try:
            sdf = qs[k](spark, sf_dir)
            if k not in osql:
                ts = time.perf_counter()
                n = sdf.count()
                row["spark_wall_sec"] = round(time.perf_counter() - ts, 2)
                row.update(
                    rows_match=n >= 0, schema_match=True, hash_match=None,
                    spark_rows=n, err="no-oracle",
                )
            else:
                to = time.perf_counter()
                ddf = con.sql(osql[k]).df()
                row["oracle_wall_sec"] = round(time.perf_counter() - to, 2)
                ts = time.perf_counter()
                probs = compare(sdf, ddf)
                # Count the ALREADY-BUILT DataFrame: rebuilding via
                # qs[k]() would re-run eager iterative operators (the
                # connected-components loop executes at build time) a
                # second time and double their recorded wall.
                sp_n = sdf.count()
                # compare() collects the Spark result + the count pass;
                # canonicalization is pandas-side but small next to the
                # engine walls, so this is the honest Spark-side cost.
                row["spark_wall_sec"] = round(time.perf_counter() - ts, 2)
                row.update(
                    spark_rows=sp_n,
                    oracle_rows=len(ddf),
                    rows_match=not any(p.startswith("row count") for p in probs),
                    schema_match=not any(p.startswith("columns") for p in probs),
                    hash_match=not probs,
                    err="; ".join(probs)[:500] or None,
                )
        except Exception as exc:  # a crash is a red row, not a crash of the sweep
            row["err"] = f"{type(exc).__name__}: {exc}"[:500]
        row["wall_sec"] = round(time.perf_counter() - tk, 2)
        if k in WALL_NOTES:
            row["wall_note"] = WALL_NOTES[k]
        out[k] = row
        status = "ok" if row["hash_match"] in (True, None) and row["rows_match"] else "FAIL"
        print(f"{k}: {status}", flush=True)

    n_ok = sum(1 for r in out.values() if r["hash_match"] is True)
    n_rows_only = sum(1 for r in out.values() if r["hash_match"] is None)
    n_fail = len(out) - n_ok - n_rows_only
    summary = {
        "n_queries": len(out),
        "n_value_match": n_ok,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "sf_dir": sf_dir,
        "wall_sec": round(time.perf_counter() - t0, 1),
    }
    if not only:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"CORRECTNESS_FULL_{tag}.json",
        )
        with open(path, "w") as fh:
            json.dump({"summary": summary, "rows": out}, fh, indent=1, sort_keys=True)
            fh.write("\n")
    print(json.dumps(summary))
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()

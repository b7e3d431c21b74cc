"""Solo-process adjudication of SCALE growth-curve exceedances.

The per-round scale sweep (tools/scale_check.py) times ~30 queries
back-to-back in one session; sub-10 s walls in that sweep inherit cache
and box-noise from their neighbors, which is exactly what left the r8
step-ratio exceedances unexplained (r8 verdict item #1). This tool
re-measures each watch key ALONE — one fresh Python/Spark process per
(key, factor), best-of-N inside it, load average recorded — the same
isolation discipline as the r7 LSH worktree A/B, and extends the
scale-path flagships' growth curve with a 50x replica point (r8 verdict
item #2) so the "designed for 100 TB" claim rests on 3 measured octaves.

Usage:
  python tools/scale_adjudicate.py --solo KEY SF_DIR [N]   (internal)
  python tools/scale_adjudicate.py [tag]                    (driver)

Driver mode patches SCALE_<tag>.json in place: each adjudicated key
gains a "solo" object (per-factor best-of-3 walls + runs + load_avg +
the solo step ratio), and each flagship gains a "50x" wall with the
20x→50x step (linear = 2.5).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DST_ROOT = "/tmp/scale_replicas"

# r8 keys whose 10x→20x step measured > 2.0 — each now carries a
# design_law in tools/scale_check.py; the solo rerun is the
# noise-controlled measurement against that law.
WATCH = [
    "ann_knn_graph_cells",
    "dd_source_overlap_kmv",
    "dd_minhash_lsh_prod",
    "dd_ngram_jaccard_lsh",
    "dd_minhash_incremental",
    "dd_containment_idx",
    "ann_knn_graph",
]

# Scale-path flagships whose curve gets the 50x point.
FLAGSHIPS = [
    "dd_minhash_lsh_prod",
    "ann_knn_graph_cells",
    "dd_source_overlap_kmv",
    "mm_phash_pairs",
    "dd_minhash_incremental",
]


def solo(key: str, sf_dir: str, n_runs: int) -> None:
    """Measure one key at one factor in THIS process; print one JSON line."""
    import __spark_entry__ as e
    from pypers_spark.session import get_session

    spark = get_session("pypers_spark-scale-solo")
    spark.sparkContext.setLogLevel("ERROR")
    q = e.queries()[key]
    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 2))
    print(
        json.dumps(
            {
                "key": key,
                "sf_dir": sf_dir,
                "best": min(runs),
                "runs": runs,
                "load_avg": round(os.getloadavg()[0], 2),
            }
        )
    )


def run_solo(key: str, sf_dir: str, n_runs: int = 3) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--solo", key, sf_dir, str(n_runs)],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--solo":
        solo(sys.argv[2], sys.argv[3], int(sys.argv[4]) if len(sys.argv) > 4 else 3)
        return

    tag = sys.argv[1] if len(sys.argv) > 1 else "r09"
    scale_path = os.path.join(REPO, f"SCALE_{tag}.json")
    with open(scale_path) as fh:
        artifact = json.load(fh)

    from tools.scale_check import gen

    dirs = {"10x": f"{DST_ROOT}/10x", "20x": f"{DST_ROOT}/20x", "50x": f"{DST_ROOT}/50x"}
    for factor, copies in (("10x", 10), ("20x", 20), ("50x", 50)):
        if not os.path.exists(f"{dirs[factor]}/events.parquet"):
            print(f"generating {factor} replicas...", file=sys.stderr)
            gen(copies, dirs[factor])

    qrows = artifact["queries"]
    for key in WATCH:
        row = qrows.setdefault(key, {})
        solo_obj = {}
        for factor in ("10x", "20x"):
            m = run_solo(key, dirs[factor])
            solo_obj[factor] = m["best"]
            solo_obj[f"runs_{factor}"] = m["runs"]
            solo_obj[f"load_avg_{factor}"] = m["load_avg"]
            print(f"solo {factor} {key}: {m['best']}s {m['runs']}", flush=True)
        solo_obj["step_2x"] = (
            round(solo_obj["20x"] / solo_obj["10x"], 2) if solo_obj["10x"] else None
        )
        row["solo"] = solo_obj

    for key in FLAGSHIPS:
        row = qrows.setdefault(key, {})
        m = run_solo(key, dirs["50x"])
        row["50x"] = m["best"]
        row["runs_50x"] = m["runs"]
        row["load_avg_50x"] = m["load_avg"]
        base_20 = (row.get("solo") or {}).get("20x") or row.get("20x")
        # 20x→50x carries 2.5x the rows: linear growth = 2.5.
        row["step_20x_to_50x"] = round(m["best"] / base_20, 2) if base_20 else None
        print(f"solo 50x {key}: {m['best']}s {m['runs']}", flush=True)

    artifact["adjudication"] = {
        "watch_keys": WATCH,
        "flagships_50x": FLAGSHIPS,
        "method": "one fresh Spark process per (key, factor), best-of-3, "
        "load_avg recorded; design laws in tools/scale_check.py DESIGN_LAWS",
    }
    with open(scale_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"patched": scale_path}))


if __name__ == "__main__":
    main()

"""Focused r12 scale evidence: counted cap-knee candidate volumes and
50x flagship walls (the r11 verdict's open item #2).

The r11 round measured these but committed no artifact. This runner
produces a STANDALONE artifact (it does not patch a full SCALE sweep):

- For each knee key (dd_minhash_lsh_prod, dd_ngram_jaccard_lsh,
  mm_phash_pairs): the pre-verify candidate-pair COUNT at 1x / 10x /
  20x / 50x (fresh Spark process per point — scale_adjudicate --count),
  the volume step ratios, and the derived counted step bound
  (1.3 x volume ratio, the scale_adjudicate convention).
- For each flagship: solo best-of-3 walls at 10x and 50x (fresh process
  per point, load-gated) and the 20x-equivalent step ratios.

Replicas are the standard key-remapped copies (tools/scale_check.gen).
Writes SCALE_COUNTS_r12.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scale_adjudicate import DST_ROOT, run_count, run_solo  # noqa: E402
from tools.scale_check import SRC, gen  # noqa: E402

KNEE_KEYS = ["dd_minhash_lsh_prod", "dd_ngram_jaccard_lsh", "mm_phash_pairs"]
FLAGSHIPS = ["dd_minhash_lsh_prod", "dd_ngram_jaccard_lsh", "mm_phash_pairs"]


def main() -> None:
    dirs = {
        "10x": f"{DST_ROOT}/10x",
        "20x": f"{DST_ROOT}/20x",
        "50x": f"{DST_ROOT}/50x",
    }
    for factor, copies in (("10x", 10), ("20x", 20), ("50x", 50)):
        if not os.path.exists(f"{dirs[factor]}/events.parquet"):
            print(f"generating {factor} replicas...", file=sys.stderr)
            gen(copies, dirs[factor])

    out: dict = {"knee": {}, "flagships": {}}
    for key in KNEE_KEYS:
        counts = {}
        for factor in ("1x", "10x", "20x", "50x"):
            sf_dir = SRC if factor == "1x" else dirs[factor]
            counts[factor] = run_count(key, sf_dir)
            print(f"candidates {factor} {key}: {counts[factor]}", flush=True)
        vol_step = (
            round(counts["20x"] / counts["10x"], 2) if counts["10x"] else None
        )
        vol_step_50 = (
            round(counts["50x"] / counts["20x"], 2) if counts["20x"] else None
        )
        out["knee"][key] = {
            **counts,
            "volume_step_2x": vol_step,
            "volume_step_20x_to_50x": vol_step_50,
            "counted_step_2x_bound": round(vol_step * 1.3, 2) if vol_step else None,
        }

    for key in FLAGSHIPS:
        row = {}
        for factor in ("10x", "20x", "50x"):
            m = run_solo(key, dirs[factor])
            row[factor] = m["best"]
            row[f"runs_{factor}"] = m["runs"]
            row[f"load_avg_{factor}"] = m["load_avg"]
            print(f"solo {factor} {key}: {m['best']}s {m['runs']}", flush=True)
        row["step_2x"] = round(row["20x"] / row["10x"], 2) if row["10x"] else None
        row["step_20x_to_50x"] = (
            round(row["50x"] / row["20x"], 2) if row["20x"] else None
        )
        knee = out["knee"].get(key)
        if knee:
            row["within_counted_bound_2x"] = (
                row["step_2x"] <= knee["counted_step_2x_bound"]
                if row["step_2x"] is not None
                else None
            )
            vol50 = knee["volume_step_20x_to_50x"]
            row["counted_step_50x_bound"] = (
                round(vol50 * 1.3, 2) if vol50 else None
            )
            row["within_counted_bound_50x"] = (
                row["step_20x_to_50x"] <= row["counted_step_50x_bound"]
                if row["step_20x_to_50x"] is not None and vol50
                else None
            )
        out["flagships"][key] = row

    out["method"] = (
        "counts: one fresh Spark process per (key, factor) counting the "
        "production pre-verify candidate DataFrame "
        "(lsh_candidate_pairs / mm_phash_candidate_pairs); walls: fresh "
        "process per point, best-of-3, load-gated (scale_adjudicate "
        "run_solo); replicas: tools/scale_check.gen key-remapped copies "
        "of sf0.1; bound convention: 1.3 x measured volume ratio"
    )
    path = os.path.join(REPO, "SCALE_COUNTS_r12.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"wrote": path}))


if __name__ == "__main__":
    main()

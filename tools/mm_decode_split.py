"""Separate DECODE compute from fixture synthesis for the mm_* keys.

r11 verdict item: the GIF/PNG fixture payload encoders are lru_cache'd
per worker over the doc_id period (disclosed in OPTIMIZATION_r11.md),
so an mm key's wall mixes (a) cached fixture SYNTHESIS, which does not
generalize to real corpora, with (b) the real codec DECODE work, which
does. This tool makes the split measurable:

1. Per-key stage split: runs each mm key warm with the UI enabled and
   records the Arrow decode stage's executorCpuTime (the stage that
   reads the media-table input bytes) vs the key's total.
2. Per-image codec split: times synth (cached vs uncached) and decode
   per media row in plain Python over the same fixture ids.

Writes MM_DECODE_<tag>.json. Usage: python tools/mm_decode_split.py [tag]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MM_KEYS = [
    "mm_gif_meta",
    "mm_png_meta",
    "mm_decode_meta",
    "mm_image_phash",
    "mm_phash_pairs",
    "mm_audio_energy",
    "mm_audio_meta",
]


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def per_image_split() -> dict:
    """Pure-Python per-image µs: fixture synth (cold + lru-warm) vs
    decode, over one full doc_id period of each codec."""
    from pypers_spark import multimodal as mm

    out = {}
    for name, enc, dec, period in (
        ("gif", mm._gif_fixture_payload, mm.gif_decoder, 572),
        ("png", mm._png_fixture_payload, mm.png_decoder, 180),
    ):
        ids = list(range(period))
        enc.cache_clear()
        t0 = time.perf_counter()
        payloads = [enc(i) for i in ids]
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in ids:
            enc(i)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for p in payloads:
            dec(p)
        decode = time.perf_counter() - t0
        out[name] = {
            "n_images": period,
            "synth_cold_us_per_image": round(cold / period * 1e6, 1),
            "synth_lru_warm_us_per_image": round(warm / period * 1e6, 1),
            "decode_us_per_image": round(decode / period * 1e6, 1),
        }
    return out


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    os.environ.setdefault("SPARK_GRAFT_UI_RETAINED", "5000")

    import __spark_entry__ as e
    from pypers_spark.session import get_session

    spark = get_session("pypers_spark-mm-decode-split")
    spark.sparkContext.setLogLevel("ERROR")
    host = (
        f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
        if spark.sparkContext.uiWebUrl
        else "http://localhost:4040"
    )
    app_id = spark.sparkContext.applicationId
    qs = e.queries()

    warm_sf = "/root/testdata/sf0.001"
    for k in MM_KEYS:
        qs[k](spark, warm_sf).write.format("noop").mode("overwrite").save()
        qs[k](spark, sf_dir).write.format("noop").mode("overwrite").save()

    rows = {}
    for k in MM_KEYS:
        df = qs[k](spark, sf_dir)
        before = {
            s["stageId"]
            for s in _get(f"{host}/api/v1/applications/{app_id}/stages")
        }
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        stages = [
            s
            for s in _get(f"{host}/api/v1/applications/{app_id}/stages")
            if s["stageId"] not in before
        ]
        total_cpu = sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
        # NB: the media table synthesizes payloads in-plan from the
        # documents scan, so no stage has meaningful inputBytes; the
        # per-key split that matters is total cpu vs the per-image
        # bound below (n_media × (synth + decode) µs). heaviest_stage
        # is recorded for orientation only.
        heaviest = max(
            stages, key=lambda s: s.get("executorCpuTime", 0), default=None
        )
        rows[k] = {
            "wall_sec": round(wall, 3),
            "total_cpu_sec": round(total_cpu, 3),
            "heaviest_stage_cpu_sec": round(
                (heaviest or {}).get("executorCpuTime", 0) / 1e9, 3
            ),
        }
        print(k, rows[k], flush=True)

    artifact = {
        "sf_dir": sf_dir,
        "method": (
            "warm single run per key, UI REST stage metrics (media payloads"
            " are synthesized in-plan, so no stage carries input bytes);"
            " the generalizable decode-vs-synthesis split is the per_image"
            " section, timed in plain Python over one fixture period —"
            " a real corpus pays synth_cold-equivalent I/O instead of the"
            " lru-warm fixture synthesis"
        ),
        "per_key": rows,
        "per_image": per_image_split(),
    }
    path = os.path.join(REPO, f"MM_DECODE_{tag}.json")
    with open(path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"wrote": path}))


if __name__ == "__main__":
    main()

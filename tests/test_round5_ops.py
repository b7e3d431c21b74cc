"""Round-5 hardening tests: pointer-doubling connected components."""

from __future__ import annotations

from pyspark.sql import functions as F


def _components(spark, undirected_pairs):
    """Run min_label_components over explicit (a, b) pairs."""
    from pypers_spark.functions import components as C

    pairs = spark.createDataFrame(undirected_pairs, "src long, dst long")
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    out = C.min_label_components(edges, labels, "tests.cc_labels")
    return {r["node"]: r["lbl"] for r in out.collect()}, C.last_rounds


def test_chain_50_converges_logarithmically(spark):
    # A 50-node path 0-1-2-...-49: diameter 49. Plain one-hop min-label
    # propagation needs ~49 rounds (the round-4 implementation raised
    # RuntimeError at its 20-round cap on exactly this shape); pointer
    # jumping contracts it to O(log d) — 5 propagation rounds plus the
    # fixed-point detection round.
    got, rounds = _components(spark, [(i, i + 1) for i in range(49)])
    assert got == {i: 0 for i in range(50)}
    assert rounds <= 6, f"expected <= 6 rounds for a 50-chain, took {rounds}"


def test_chain_200_still_single_digit_rounds(spark):
    # 4x the diameter costs ~2 extra doubling rounds, not 4x the rounds.
    got, rounds = _components(spark, [(i, i + 1) for i in range(199)])
    assert got == {i: 0 for i in range(200)}
    assert rounds <= 8, f"expected <= 8 rounds for a 200-chain, took {rounds}"


def test_multiple_components_and_isolated_nodes(spark):
    # Two components with non-adjacent min ids plus a self-contained
    # star; labels must be each component's min and never leak across.
    pairs = [
        (10, 11), (11, 12),          # path {10,11,12}
        (3, 7), (7, 5),              # path {3,5,7} with min in the middle
        (20, 21), (20, 22), (20, 23) # star {20..23}
    ]
    got, _ = _components(spark, pairs)
    assert got == {
        10: 10, 11: 10, 12: 10,
        3: 3, 7: 3, 5: 3,
        20: 20, 21: 20, 22: 20, 23: 20,
    }


def test_components_match_union_find_on_random_graphs(spark):
    # Property check against an independent reference implementation:
    # pointer-doubling labels must equal union-find's min-id components
    # on arbitrary graph shapes (chains, stars, cliques, isolated pairs,
    # cross-links) — deterministic seeds, 6 random graphs.
    import random

    def union_find_labels(pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        groups = {}
        for n in list(parent):
            groups.setdefault(find(n), []).append(n)
        return {
            n: min(members) for members in groups.values() for n in members
        }

    rng = random.Random(20260814)
    for trial in range(6):
        n_nodes = rng.randint(4, 40)
        n_edges = rng.randint(1, 60)
        pairs = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        got, _ = _components(spark, pairs)
        assert got == union_find_labels(pairs), f"trial {trial}: {pairs}"


def test_ppm_roundtrip_and_header_quirks():
    from pypers_spark.multimodal import decode_ppm, encode_ppm

    pixels = bytes(range(2 * 3 * 3))  # 3x2 RGB
    payload = encode_ppm(3, 2, pixels)
    assert decode_ppm(payload) == (3, 2, pixels)
    # netpbm allows comments and arbitrary whitespace between tokens
    quirky = b"P6 # comment\n# another\n 3\t2 \n255\n" + pixels
    assert decode_ppm(quirky) == (3, 2, pixels)
    import pytest

    with pytest.raises(ValueError):
        decode_ppm(b"P5\n3 2\n255\n" + pixels)  # wrong magic
    with pytest.raises(ValueError):
        decode_ppm(payload[:-1])  # truncated pixels


def test_bmp_header_parse():
    from pypers_spark.multimodal import bmp_decoder, decode_bmp

    # Minimal BITMAPINFOHEADER: 14-byte file header + 40-byte info header
    hdr = bytearray(54)
    hdr[0:2] = b"BM"
    hdr[18:22] = (640).to_bytes(4, "little")
    hdr[22:26] = (-480).to_bytes(4, "little", signed=True)  # top-down
    hdr[28:30] = (24).to_bytes(2, "little")
    assert decode_bmp(bytes(hdr)) == (640, 480, 24)
    d = bmp_decoder(bytes(hdr))
    assert (d["width"], d["height"], d["n_channels"]) == (640, 480, 3)


def test_box_resize_matches_naive_reference():
    from pypers_spark.multimodal import box_resize_ppm, decode_ppm, encode_ppm

    # 5x4 RGB with a deterministic non-uniform pattern; factor 2 drops
    # the trailing odd column (floor dims) and floor-averages each block.
    w, h = 5, 4
    pixels = bytes((r * 31 + q * 7 + c * 3) % 256 for r in range(h)
                   for q in range(w) for c in range(3))
    out = box_resize_ppm(encode_ppm(w, h, pixels), factor=2)
    ow, oh, opix = decode_ppm(out)
    assert (ow, oh) == (2, 2)

    def src(r, q, c):
        return pixels[(r * w + q) * 3 + c]

    for i in range(oh):
        for j in range(ow):
            for c in range(3):
                want = (src(2 * i, 2 * j, c) + src(2 * i, 2 * j + 1, c)
                        + src(2 * i + 1, 2 * j, c)
                        + src(2 * i + 1, 2 * j + 1, c)) // 4
                assert opix[(i * ow + j) * 3 + c] == want


def test_wav_header_parse():
    import struct

    from pypers_spark.multimodal import decode_wav, wav_decoder

    # Stereo 16-bit 8 kHz, 0.5 s of silence, with a LIST chunk between
    # fmt and data to exercise the chunk walk (non-canonical layout).
    channels, rate, bits, n_frames = 2, 8000, 16, 4000
    byte_rate = rate * channels * bits // 8
    data = b"\x00" * (n_frames * channels * bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate,
                      channels * bits // 8, bits)
    list_chunk = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt \
        + list_chunk + b"data" + len(data).to_bytes(4, "little") + data
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body

    meta = decode_wav(payload)
    assert meta["n_channels"] == 2
    assert meta["sample_rate"] == 8000
    assert meta["bits_per_sample"] == 16
    assert meta["duration_s"] == 0.5
    d = wav_decoder(payload)
    assert (d["width"], d["height"], d["n_channels"]) == (n_frames, 1, 2)

    import pytest

    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + body)


def test_ppm_media_table_payloads_are_real_ppm(spark, tables):
    from pypers_spark.multimodal import decode_ppm, ppm_media_table

    rows = ppm_media_table(tables["documents"]).orderBy("media_id").limit(5).collect()
    for r in rows:
        w, h, pix = decode_ppm(bytes(r["payload"]))
        assert w == 4 + r["media_id"] % 13
        assert h == 3 + r["media_id"] % 11
        assert len(pix) == w * h * 3


def test_production_tau_paths_non_vacuous(spark, tables):
    # The τ=0.9 entries must return rows (planted clone pairs) — a
    # 0-row gate at the production threshold certifies nothing.
    from pypers_spark.operators.graph import gr_pagerank
    from pypers_spark.operators.similarity import (
        PLANT_N,
        dd_cluster,
        dd_embedding_cos,
    )

    pairs = dd_embedding_cos(tables).collect()
    assert len(pairs) == PLANT_N  # exactly the (origin, clone) pairs
    for r in pairs:
        assert r["id_b"] == r["id_a"] + 1_000_000
        assert r["cos_sim"] >= 0.9
    assert gr_pagerank(tables).count() == 2 * PLANT_N  # both endpoints ranked
    clusters = dd_cluster(tables).filter("cluster_size > 1").collect()
    assert len(clusters) == 2 * PLANT_N  # each clone pair forms a 2-cluster


def test_adaptive_join_routes_by_measured_skew(spark):
    # Hot fixture: one key holding 500 of 510 rows (ratio >> 4) must
    # route salted; a uniform fixture must route plain — and the salted
    # plan must actually contain the salt machinery (not just claim to).
    from pyspark.sql import functions as F

    from pypers_spark.functions.skew import adaptive_join

    hot = spark.range(500).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = spark.range(10).select((F.col("id") + 1).alias("k"), F.col("id").alias("v"))
    skewed = hot.unionByName(cold)
    small = skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n"))

    joined, strategy, ratio = adaptive_join(skewed, small, "k", n_salts=4)
    assert strategy == "salted" and ratio > 4
    assert "_salt" in joined._jdf.queryExecution().analyzed().toString()
    assert joined.count() == 510  # salting must not duplicate or drop rows

    uniform = spark.range(512).select((F.col("id") % 64).alias("k"), F.col("id").alias("v"))
    u_small = uniform.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    joined2, strategy2, ratio2 = adaptive_join(uniform, u_small, "k", n_salts=4)
    assert strategy2 == "plain" and ratio2 <= 4
    assert "_salt" not in joined2._jdf.queryExecution().analyzed().toString()


def test_op_adaptive_join_switches_on_injected_leg(spark):
    # At sf0.01 the injected hot-key collapse crosses the threshold
    # (ratio ~24) while the organic leg stays uniform (~1.3): the gate
    # query itself must show both strategies.
    from pypers_spark.sources import load_tables

    from pypers_spark.operators.relational_extra import op_adaptive_join

    tables = load_tables(spark, "/root/testdata/sf0.01")
    rows = {r["leg"]: r for r in op_adaptive_join(tables).collect()}
    assert rows["organic"]["strategy"] == "plain"
    assert rows["injected"]["strategy"] == "salted"
    assert rows["injected"]["skew_ratio"] > 4 > rows["organic"]["skew_ratio"]
    assert rows["organic"]["n_rows"] == rows["injected"]["n_rows"]


def test_package_zip_contains_sources_only():
    import zipfile

    from pypers_spark.submit import build_package_zip

    path = build_package_zip()
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
    assert "pypers_spark/session.py" in names
    assert "pypers_spark/operators/dedup.py" in names
    assert not [n for n in names if not n.endswith(".py")]
    assert not [n for n in names if n.startswith("tests/")]


def test_submit_smoke_multi_executor():
    # Runs in a SUBPROCESS: an in-process SparkSession.builder would
    # silently reuse the suite's local[4] context instead of starting
    # local-cluster executors, and the smoke would prove nothing.
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "pypers_spark", "--submit-smoke"],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "submit-smoke: PASS" in proc.stdout


def test_drop_list_unchanged_by_rewrite(spark, duck, sf_dir):
    # The rewrite must not move the gate: the drop list still matches
    # its recursive-CTE oracle value-for-value.
    from tests.oracle_check import check_query

    assert check_query(spark, duck, "dd_minhash_drop_list", sf_dir) == []

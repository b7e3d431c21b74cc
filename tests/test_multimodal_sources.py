"""Multimodal plumbing (§2.F) and sources/sinks (§2.E) tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pypers_spark.multimodal import (
    DECODED_SCHEMA,
    FEATURE_DIM,
    decode_media,
    extract_features,
    media_table,
    resize_media,
    sample_frames,
)
from pypers_spark.sources import (
    read_csv,
    read_json,
    write_csv,
    write_json,
    write_parquet,
)


@pytest.fixture(scope="module")
def media(tables):
    return media_table(tables["documents"])


# -- multimodal ---------------------------------------------------------------


def test_media_table_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert media.count() > 0


def test_decode_media_deterministic(media):
    decoded = decode_media(media)
    assert decoded.schema == DECODED_SCHEMA
    pdf = decoded.orderBy("media_id").limit(5).toPandas()
    pdf2 = decode_media(media).orderBy("media_id").limit(5).toPandas()
    assert pdf.equals(pdf2)  # stub decode is deterministic
    assert (pdf["width"] >= 16).all() and (pdf["n_channels"] <= 4).all()


def test_decode_row_count_preserved(media):
    assert decode_media(media).count() == media.count()


def test_extract_features_shape(media):
    feats = extract_features(media).limit(3).toPandas()
    for vec in feats["features"]:
        assert len(vec) == FEATURE_DIM
        assert abs(sum(vec) - 1.0) < 1e-5  # normalized histogram


def test_resize_truncates(media):
    resized = resize_media(media, max_bytes=16)
    assert resized.agg(F.max("n_bytes")).collect()[0][0] <= 16
    # Full media schema preserved → composes with decode.
    assert decode_media(resized).count() == media.count()


def test_sample_frames_explodes(media):
    frames = sample_frames(media, n_frames=4)
    pdf = frames.groupBy("media_id").count().toPandas()
    assert (pdf["count"] <= 4).all() and (pdf["count"] >= 1).all()
    assert frames.count() > media.count()


def test_custom_decoder_injection(media):
    """set_decoder() swaps the codec process-wide; decoder= overrides per-plan;
    resetting restores the deterministic stub (VERDICT r2 item 4)."""
    from pypers_spark import multimodal as mm

    def codec(payload: bytes, mime_type: str) -> dict:
        return {
            "width": 1,
            "height": 2,
            "n_channels": 3,
            "content_sha": f"custom:{mime_type}",
        }

    mm.set_decoder(codec)
    try:
        pdf = decode_media(media).orderBy("media_id").limit(3).toPandas()
        assert (pdf["width"] == 1).all() and (pdf["height"] == 2).all()
        assert (pdf["content_sha"] == "custom:application/octet-stream").all()
    finally:
        mm.set_decoder(None)
    # Per-plan override without global registration.
    pdf2 = decode_media(media, decoder=codec).limit(2).toPandas()
    assert (pdf2["n_channels"] == 3).all()
    # Stub restored after reset.
    pdf3 = decode_media(media).limit(2).toPandas()
    assert not pdf3["content_sha"].str.startswith("custom:").any()


def test_custom_decoder_reaches_registry_query(spark, sf_dir):
    """The registered codec flows through the oracled mm_decode_meta
    registry entry — proving the value-gated path is the pluggable one."""
    from pypers_spark import multimodal as mm
    from pypers_spark.operators.text import mm_decode_meta
    from pypers_spark.sources import load_tables

    tables = load_tables(spark, sf_dir)
    mm.set_decoder(lambda payload, mime: {
        "width": 7, "height": 7, "n_channels": 1, "content_sha": "x",
    })
    try:
        row = mm_decode_meta(tables).limit(1).toPandas().iloc[0]
        assert row["width"] == 7 and row["content_sha"] == "x"
    finally:
        mm.set_decoder(None)
    row = mm_decode_meta(tables).limit(1).toPandas().iloc[0]
    assert row["content_sha"] != "x"


def test_custom_feature_extractor_injection(media):
    from pypers_spark import multimodal as mm

    mm.set_feature_extractor(lambda payload: [float(len(payload)), 0.0])
    try:
        pdf = extract_features(media).limit(2).toPandas()
        assert all(len(v) == 2 and v[1] == 0.0 for v in pdf["features"])
    finally:
        mm.set_feature_extractor(None)


def test_pillow_decoder_raises_without_pillow():
    """Container has no Pillow: the factory must fail actionably, not at
    executor runtime."""
    from pypers_spark import multimodal as mm

    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="set_decoder"):
        mm.pillow_decoder()


def test_metadata_query_prunes_payload(media, tmp_path, spark):
    """Metadata-only queries over stored media must not read payload bytes."""
    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    scan = spark.read.parquet(path).select("media_id", "mime_type", "n_bytes")
    explained = scan._jdf.queryExecution().toString()
    assert "payload" not in explained.split("ReadSchema:")[-1]


# -- sources / sinks ----------------------------------------------------------


def test_csv_roundtrip(spark, tables, tmp_path):
    nation = tables["nation"]
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, schema=nation.schema)
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nation.collect()
    )


def test_json_roundtrip(spark, tables, tmp_path):
    region = tables["region"]
    path = str(tmp_path / "region_json")
    write_json(region, path)
    back = read_json(spark, path, schema=region.schema)
    assert back.count() == region.count()


def test_partitioned_parquet_sink_prunes(spark, tables, tmp_path):
    docs = tables["documents"]
    path = str(tmp_path / "docs_part")
    write_parquet(docs, path, partition_by=["lang"], sort_within_partitions=["doc_id"])
    one_lang = spark.read.parquet(path).filter(F.col("lang") == "en")
    explained = one_lang._jdf.queryExecution().toString()
    # Partition pruning: the physical scan must carry the partition filter.
    assert "PartitionFilters" in explained and "lang" in explained
    assert one_lang.count() == docs.filter(F.col("lang") == "en").count()


def test_orc_roundtrip_with_pushdown(spark, tables, tmp_path):
    """ORC sink/scan round-trip; filters reach the ORC reader."""
    from pypers_spark.sources import read_orc, write_orc
    from pyspark.sql import functions as F

    path = str(tmp_path / "orders_orc")
    write_orc(tables["orders"], path, partition_by=["o_orderstatus"])
    back = read_orc(spark, path)
    assert back.count() == tables["orders"].count()
    pruned = back.filter(F.col("o_orderstatus") == "F")
    explained = pruned._jdf.queryExecution().toString()
    # partition pruning on the partitionBy column
    assert back.filter(F.col("o_orderstatus") == "F").count() == tables[
        "orders"
    ].filter(F.col("o_orderstatus") == "F").count()
    assert "PartitionFilters" in explained or "o_orderstatus" in explained


def test_text_roundtrip_lines_and_wholetext(spark, tmp_path):
    from pypers_spark.sources import read_text, write_text

    df = spark.createDataFrame([("line one",), ("line two",), ("line three",)], "value string")
    path = str(tmp_path / "txt")
    write_text(df, path)
    lines = read_text(spark, path)
    assert lines.columns == ["value"]
    assert sorted(r["value"] for r in lines.collect()) == [
        "line one", "line three", "line two",
    ]
    whole = read_text(spark, path, whole_text=True)
    # one row per file; together they carry all three lines
    joined = "\n".join(r["value"] for r in whole.collect())
    for needle in ("line one", "line two", "line three"):
        assert needle in joined


def test_binary_files_source_reads_payload_and_meta(spark, tmp_path):
    from pypers_spark.sources import read_binary_files

    d = tmp_path / "bin"
    d.mkdir()
    (d / "a.img").write_bytes(b"\x00\x01\x02payload-a")
    (d / "b.img").write_bytes(b"payload-b")
    (d / "skip.txt").write_bytes(b"not-an-image")
    df = read_binary_files(spark, str(d), glob="*.img")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.img", "b.img"}
    assert bytes(rows["a.img"]["content"]) == b"\x00\x01\x02payload-a"
    assert rows["b.img"]["length"] == len(b"payload-b")


def test_load_table_microsecond_events_passthrough(spark, sf_dir, tmp_path):
    """Regression for registry.py's LongType guard: a standard
    µs-timestamp events parquet (any non-driver events source) must
    pass through load_table with ts still a timestamp — only ns files
    (read as long under nanosAsLong) take the long→timestamp_micros
    conversion."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType, TimestampType

    from pypers_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    ev.write.parquet(str(tmp_path / "events.parquet"))
    ev2 = load_table(spark, str(tmp_path), "events")
    assert isinstance(ev2.schema["ts"].dataType, (TimestampType, TimestampNTZType))
    a = sorted((r.event_id, r.ts) for r in ev.select("event_id", "ts").collect())
    b = sorted((r.event_id, r.ts) for r in ev2.select("event_id", "ts").collect())
    assert a == b and len(a) > 0


def test_wav_media_table_roundtrips_chunk_walker(spark, sf_dir):
    """The JVM-assembled RIFF/WAVE payloads must parse back to the
    doc_id-derived parameters through the real chunk walker — including
    the every-4th-doc odd-sized LIST chunk (chunk ordering + word
    alignment) and odd data sizes (trailing pad byte)."""
    from pypers_spark.multimodal import (
        WAV_DATA_BASE,
        WAV_DATA_MOD,
        WAV_RATE_BASE,
        WAV_RATE_MOD,
        decode_wav,
        wav_media_table,
    )
    from pypers_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(24)
    rows = wav_media_table(docs).collect()
    assert rows, "fixture produced no media rows"
    saw_list = saw_odd = False
    for r in rows:
        did = r["media_id"]
        payload = bytes(r["payload"])
        meta = decode_wav(payload)
        assert meta["n_channels"] == 1 + did % 2
        assert meta["sample_rate"] == WAV_RATE_BASE * (1 + did % WAV_RATE_MOD)
        assert meta["bits_per_sample"] == 8 + 8 * ((did % 5) % 2)
        assert meta["data_bytes"] == WAV_DATA_BASE + did % WAV_DATA_MOD
        if did % 4 == 0:
            saw_list = True
            assert b"LIST" in payload
        if meta["data_bytes"] % 2 == 1:
            saw_odd = True
            assert len(payload) % 2 == 0  # pad byte present
    assert saw_list and saw_odd

"""Round-10 coverage wave: the PNG codec (second compressed format the
container decodes with zero new dependencies — stdlib zlib DEFLATE plus
real scanline-filter reconstruction) behind mm_png_meta."""

from __future__ import annotations


def test_png_roundtrip_all_filters():
    # Every fixture image exercises all five PNG filter types
    # (row r of doc d is filtered with (d + r) % 5), so a round-trip
    # over several docs covers None/Sub/Up/Average/Paeth reconstruction
    # including the cross-row prediction state.
    from pypers_spark.multimodal import PNG_N_COLORS, decode_png, encode_png

    for d in (0, 1, 2, 3, 4, 7, 99, 54321):
        w, h = 5 + d % 12, 4 + d % 9
        pix = bytes((7 * d + 3 * i) % PNG_N_COLORS for i in range(w * h))
        payload = encode_png(w, h, pix, lambda r, d=d: (d + r) % 5)
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        assert decode_png(payload) == (w, h, pix)


def test_png_decoder_rejects_corruption():
    # CRC verification is part of the chunk walk: flip one IDAT byte
    # and the reader must refuse rather than return wrong pixels.
    import pytest

    from pypers_spark.multimodal import decode_png, encode_png

    payload = bytearray(encode_png(4, 3, bytes(range(4)) * 3, lambda r: r % 5))
    idat = payload.index(b"IDAT")
    payload[idat + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_png_multi_idat_reassembly():
    # Real-world PNGs split the DEFLATE stream across several IDAT
    # chunks; the reader must concatenate before inflating. Re-split a
    # single-IDAT payload into 8-byte IDATs and decode.
    from pypers_spark.multimodal import _png_chunk, decode_png, encode_png

    w, h = 9, 6
    pix = bytes((3 * i) % 5 for i in range(w * h))
    payload = encode_png(w, h, pix, lambda r: (r + 2) % 5)
    sig, pos, chunks = payload[:8], 8, []
    while pos < len(payload):
        n = int.from_bytes(payload[pos : pos + 4], "big")
        chunks.append((payload[pos + 4 : pos + 8], payload[pos + 8 : pos + 8 + n]))
        pos += 12 + n
    rebuilt = sig
    for ctype, data in chunks:
        if ctype == b"IDAT":
            for i in range(0, len(data), 8):
                rebuilt += _png_chunk(b"IDAT", data[i : i + 8])
        else:
            rebuilt += _png_chunk(ctype, data)
    assert decode_png(rebuilt) == (w, h, pix)


def test_png_decoder_injection_contract(spark, tables):
    # A registered decoder must win over the PNG fallback in
    # mm_png_meta — the same set_decoder contract mm_gif_meta and
    # mm_decode_meta pin.
    from pypers_spark import multimodal as mm
    from pypers_spark.operators.text import mm_png_meta

    def fake(payload, mime_type=""):
        return {
            "width": -1,
            "height": -1,
            "n_channels": 9,
            "content_sha": "injected",
        }

    mm.set_decoder(fake)
    try:
        row = mm_png_meta(tables).limit(1).collect()[0]
        assert (row["width"], row["content_sha"]) == (-1, "injected")
    finally:
        mm.set_decoder(None)
    row = mm_png_meta(tables).limit(1).collect()[0]
    assert row["width"] > 0 and row["content_sha"] != "injected"


def test_png_decode_bomb_defense():
    # r10 advisory: dimensions are validated BEFORE the IDAT inflate and
    # the inflate itself is bounded — an adversarial payload can neither
    # declare huge dims nor expand a small declaration into a huge
    # allocation (decompression bomb).
    import zlib

    import pytest

    from pypers_spark.multimodal import PNG_MAX_DIM, PNG_SIG, decode_png

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    def ihdr(w: int, h: int) -> bytes:
        return w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])

    huge = (
        PNG_SIG
        + chunk(b"IHDR", ihdr(PNG_MAX_DIM + 1, 4))
        + chunk(b"IDAT", zlib.compress(b"\0" * 10))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="exceed cap"):
        decode_png(huge)

    bomb = (
        PNG_SIG
        + chunk(b"IHDR", ihdr(4, 4))
        + chunk(b"IDAT", zlib.compress(b"\0" * 10_000_000))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(bomb)

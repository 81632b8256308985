"""Real-container multimodal decode: header builders vs the sniffing parser,
plus the Spark pipeline round-trip."""

import pytest

from tmframe_spark.vec.multimodal import (
    build_avi,
    build_bmp,
    build_gif,
    build_png,
    build_wav,
    media_dims,
    sniff_media,
    synth_media,
    extract_features,
)


@pytest.mark.parametrize(
    "payload,want",
    [
        (build_png(640, 480), ("png", 640, 480, 1)),
        (build_png(16, 65535), ("png", 16, 65535, 1)),
        (build_gif(320, 200), ("gif", 320, 200, 1)),
        (build_bmp(1024, 768), ("bmp", 1024, 768, 1)),
        (build_wav(8000, 1, 400), ("wav", 0, 0, 400)),
        (build_wav(44100, 2, 1000), ("wav", 0, 0, 1000)),
        (build_avi(1920, 1080, 240), ("avi", 1920, 1080, 240)),
    ],
)
def test_header_roundtrip(payload, want):
    assert sniff_media(payload) == want


def test_bmp_topdown_negative_height():
    import struct

    p = bytearray(build_bmp(100, 50))
    struct.pack_into("<i", p, 22, -50)  # top-down BMPs store negative height
    assert sniff_media(bytes(p)) == ("bmp", 100, 50, 1)


def test_unknown_magic_falls_to_stub():
    fmt, w, h, nf = sniff_media(b"\x00\x01unknowncontainer" + b"\x00" * 64)
    assert fmt == "unknown" and w >= 16 and h >= 16 and nf == 1


def test_real_png_fixture_checks_with_external_parser():
    # cross-check our builder against python's own (independent) png sniffing
    # via the stdlib 'imghdr'-style magic check: PNG signature + IHDR
    p = build_png(123, 456)
    assert p[:8] == b"\x89PNG\r\n\x1a\n"
    assert p[12:16] == b"IHDR"
    import zlib
    import struct

    # CRC of the IHDR chunk must be valid (a real PNG reader checks it)
    length = struct.unpack(">I", p[8:12])[0]
    chunk = p[12 : 16 + length]
    crc = struct.unpack(">I", p[16 + length : 20 + length])[0]
    assert crc == (zlib.crc32(chunk) & 0xFFFFFFFF)


def test_spark_pipeline_decodes_known_dims(spark):
    out = extract_features(synth_media(spark, 64))
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 64
    for mid, r in rows.items():
        kind, w, h, nf = media_dims(mid)
        assert r["kind"] == kind
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf), mid
        assert r["fmt"] in ("png", "gif", "bmp", "wav", "avi")
        assert len(r["feature"]) == 8

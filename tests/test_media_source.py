"""binaryFile media ingest (sources/media.py): a directory of raw files
becomes MEDIA_SCHEMA rows that the multimodal stages consume unchanged."""

from __future__ import annotations

from mapreduceframework_cpp_spark.operators.multimodal import (
    decode_media,
    sample_frames,
)
from mapreduceframework_cpp_spark.sources.media import (
    media_files_to_rows,
    read_media_dir,
)


def _stage_files(tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "cat.jpg").write_bytes(b"\xff\xd8fakejpegpayload" * 10)
    (d / "song.wav").write_bytes(b"RIFFfakewav" * 20)
    (d / "clip.mp4").write_bytes(b"\x00\x00ftypfakemp4" * 30)
    (d / "notes.txt").write_bytes(b"not media")
    return d


def test_media_dir_to_rows(spark, tmp_path):
    d = _stage_files(tmp_path)
    rows = media_files_to_rows(read_media_dir(spark, str(d))).collect()
    by_type = {r.media_type: r for r in rows}
    assert set(by_type) == {"image", "audio", "video", "unknown"}
    img = by_type["image"]
    assert img.meta.format == "jpg"
    assert img.meta.n_bytes == len(b"\xff\xd8fakejpegpayload" * 10)
    assert img.meta.source == "cat.jpg"
    assert bytes(img.content).startswith(b"\xff\xd8")
    # stable ids: re-ingest assigns identical doc_ids (idempotent appends)
    again = {r.meta.source: r.doc_id for r in
             media_files_to_rows(read_media_dir(spark, str(d))).collect()}
    assert again == {r.meta.source: r.doc_id for r in rows}


def test_glob_filter_pushes_to_listing(spark, tmp_path):
    d = _stage_files(tmp_path)
    got = read_media_dir(spark, str(d), glob="*.jpg").collect()
    assert len(got) == 1 and got[0].path.endswith("cat.jpg")


def test_ingested_media_feeds_multimodal_stages(spark, tmp_path):
    d = _stage_files(tmp_path)
    media = media_files_to_rows(read_media_dir(spark, str(d)))
    decoded = decode_media(media)
    assert decoded.count() == 4
    assert {f.name for f in decoded.schema.fields} == {
        "doc_id", "media_type", "width", "height", "n_channels",
        "content_digest",
    }
    frames = sample_frames(media, every_n_bytes=64)
    assert frames.count() > 0  # the mp4 row yields sampled offsets


def _tiny_png(width=3, height=2, rgb=(10, 200, 30)) -> bytes:
    """Hand-build a minimal valid RGB PNG with stdlib zlib only — no
    imaging dependency. Chunk layout: signature, IHDR, IDAT (scanlines
    with filter byte 0), IEND, each with CRC32 (VERDICT r5 item 6: the
    PIL slot-in in operators/multimodal.py had never seen a real byte
    payload; this literal gives it one wherever PIL exists)."""
    import struct
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(rgb) * width for _ in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_literal_is_wellformed():
    """The byte literal itself is a structurally valid PNG: parse IHDR
    width/height/bit-depth/color-type straight from the fixed offsets
    and re-check the IHDR CRC — pure-Python, runs in every container."""
    import struct
    import zlib

    png = _tiny_png(width=3, height=2)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert png[12:16] == b"IHDR"
    w, h = struct.unpack(">II", png[16:24])
    bit_depth, color_type = png[24], png[25]
    assert (w, h, bit_depth, color_type) == (3, 2, 8, 2)  # 8-bit RGB
    crc = struct.unpack(">I", png[29:33])[0]
    assert crc == zlib.crc32(png[12:29]) & 0xFFFFFFFF


def test_decode_real_png_via_pil():
    """_decode_image_bytes's REAL branch: wherever PIL exists it must
    return the PNG's true dimensions/bands, not the digest fake. Skips
    (never silently passes) where the container lacks PIL."""
    import importlib.util

    import pytest

    if importlib.util.find_spec("PIL") is None:
        pytest.skip("PIL not installed in this container")
    from mapreduceframework_cpp_spark.operators.multimodal import (
        _decode_image_bytes,
    )

    assert _decode_image_bytes(_tiny_png(width=3, height=2)) == (3, 2, 3)
    assert _decode_image_bytes(_tiny_png(width=7, height=5)) == (7, 5, 3)


def test_decode_fallback_is_digest_deterministic():
    """Without PIL (or on undecodable bytes) the fallback derives
    dimensions from the sha256 digest — byte-deterministic, bounded to
    [16, 255] sides and [1, 4] channels. Pinned so the declared-stub
    behavior can't drift silently."""
    import hashlib
    import importlib.util

    from mapreduceframework_cpp_spark.operators.multimodal import (
        _decode_image_bytes,
    )

    data = b"definitely-not-an-image"
    d = hashlib.sha256(data).digest()
    expected = (16 + d[0] % 240, 16 + d[1] % 240, 1 + d[2] % 4)
    assert _decode_image_bytes(data) == expected
    assert _decode_image_bytes(data) == _decode_image_bytes(data)
    if importlib.util.find_spec("PIL") is None:
        # the real PNG also routes to the fallback here — and still
        # deterministically
        png = _tiny_png()
        pd_ = hashlib.sha256(png).digest()
        assert _decode_image_bytes(png) == (
            16 + pd_[0] % 240, 16 + pd_[1] % 240, 1 + pd_[2] % 4,
        )

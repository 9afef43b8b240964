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


def test_png_literal_is_wellformed():
    """The PIL-branch fixture (tests/test_llm_pipeline.py::_tiny_png)
    is only ever OPENED where PIL exists — which this container lacks —
    so nothing here proved the literal itself is a valid PNG. Validate
    its structure in pure Python so it runs in EVERY container: parse
    IHDR width/height/bit-depth/color-type from the fixed offsets,
    re-check the IHDR CRC, and confirm the IDAT payload inflates to
    the exact filtered-scanline byte count."""
    import struct
    import zlib

    from tests.test_llm_pipeline import _tiny_png

    png = _tiny_png(2, 3)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert png[12:16] == b"IHDR"
    w, h = struct.unpack(">II", png[16:24])
    bit_depth, color_type = png[24], png[25]
    assert (w, h, bit_depth, color_type) == (2, 3, 8, 2)  # 8-bit RGB
    crc = struct.unpack(">I", png[29:33])[0]
    assert crc == zlib.crc32(png[12:29]) & 0xFFFFFFFF
    assert png[37:41] == b"IDAT"
    idat_len = struct.unpack(">I", png[33:37])[0]
    raw = zlib.decompress(png[41 : 41 + idat_len])
    assert len(raw) == h * (1 + 3 * w)  # filter byte + RGB per scanline

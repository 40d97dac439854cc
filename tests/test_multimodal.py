from __future__ import annotations

import pytest

from dbt_fal_spark.operators.multimodal import (
    decode_image,
    decode_pipeline,
    fake_decode_meta,
)

_HAS_PIL = True
try:
    import PIL  # noqa: F401
except ImportError:
    _HAS_PIL = False


@pytest.mark.skipif(_HAS_PIL, reason="PIL installed: stub path inactive")
def test_decode_image_raises_without_codec():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


@pytest.mark.skipif(not _HAS_PIL, reason="requires PIL")
def test_decode_image_real_codec():
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 7)).save(buf, format="PNG")
    meta = decode_image(buf.getvalue())
    assert meta == {"width": 12, "height": 7, "format": "png"}


@pytest.mark.skipif(not _HAS_PIL, reason="requires PIL")
def test_decode_pipeline_uses_real_codec_when_available(spark):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r.asDict() for r in decode_pipeline(df).collect()}
    # real PNG → codec dimensions; junk bytes → deterministic fake
    assert (rows[1]["width"], rows[1]["height"], rows[1]["format"]) == (32, 16, "png")
    assert rows[2] == {"doc_id": 2, "n_bytes": 12, **fake_decode_meta(b"not an image")}


def test_decode_pipeline_fake_path_matches_fake_meta(spark):
    payload = b"\x89PNG but truncated garbage"
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    (row,) = decode_pipeline(df).collect()
    meta = fake_decode_meta(payload)
    assert (row["width"], row["height"], row["format"]) == (
        meta["width"], meta["height"], meta["format"],
    )
    assert row["n_bytes"] == len(payload)


def test_fake_decode_is_deterministic():
    a = fake_decode_meta(b"hello world")
    b = fake_decode_meta(b"hello world")
    assert a == b
    assert set(a) == {"width", "height", "format"}
    assert 1 <= a["width"] <= 640
    assert 1 <= a["height"] <= 480


def _stdlib_png(width: int, height: int) -> bytes:
    """A minimal valid RGB PNG built with only zlib+struct — lets the
    real-codec branch be exercised with generated image bytes in ANY
    environment that has a codec, without needing one to author them."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x80\x40" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_generated_png_header_is_valid():
    import struct

    png = _stdlib_png(21, 9)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", png[16:24])
    assert (w, h) == (21, 9)


def test_decode_pipeline_on_generated_png(spark):
    """Runs in EVERY environment: with the [multimodal] extra installed
    the real PIL branch decodes the generated PNG's true dimensions;
    without it the pipeline's documented fallback applies the
    deterministic fake. Either way the Arrow plumbing executes on real
    image bytes."""
    png = _stdlib_png(21, 9)
    df = spark.createDataFrame(
        [(1, bytearray(png))], "doc_id long, payload binary"
    )
    (row,) = decode_pipeline(df).collect()
    assert row["n_bytes"] == len(png)
    if _HAS_PIL:
        assert (row["width"], row["height"], row["format"]) == (21, 9, "png")
    else:
        meta = fake_decode_meta(png)
        assert (row["width"], row["height"], row["format"]) == (
            meta["width"], meta["height"], meta["format"],
        )

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

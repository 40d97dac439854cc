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


def test_resize_math_thumbnail_contract(spark):
    """m_resize_pipeline's integer thumbnail math: long side capped at
    224, short side scaled by integer division with a floor of 1, no
    upscaling of small images — verified directly over the registry
    entry's real plan at sf0.001."""
    from dbt_fal_spark.registry import all_queries

    spec = all_queries()["m_resize_pipeline"]
    rows = spec.fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 1 <= r["out_w"] <= 224 and 1 <= r["out_h"] <= 224
        if max(r["in_w"], r["in_h"]) <= 224:  # never upscale
            assert (r["out_w"], r["out_h"]) == (r["in_w"], r["in_h"])
        elif r["in_w"] >= r["in_h"]:
            assert r["out_w"] == 224
            assert r["out_h"] == max(1, (r["in_h"] * 224) // r["in_w"])
        else:
            assert r["out_h"] == 224
            assert r["out_w"] == max(1, (r["in_w"] * 224) // r["in_h"])
        assert r["n_out_bytes"] == r["out_w"] * r["out_h"] * 3


@pytest.mark.skipif(not _HAS_PIL, reason="requires PIL")
def test_resize_pipeline_real_codec_keeps_original_dims():
    """The PIL branch must report the ORIGINAL dims as in_w/in_h
    (Image.thumbnail mutates in place — a naive im.size read after
    would lose them) and the thumbnailed dims as out_w/out_h."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (448, 224)).save(buf, format="PNG")
    # the entry fn is sf-bound and the container has no PIL, so the PIL
    # branch is pinned via a faithful mirror of the self-contained
    # closure (the fake path + plumbing are covered by the oracle gate)
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [1], "payload": [buf.getvalue()]})
    out = None
    for chunk in _resize_batches_for_test(pdf):
        out = chunk
    assert out is not None
    row = out.iloc[0]
    assert (row["in_w"], row["in_h"]) == (448, 224)
    assert (row["out_w"], row["out_h"]) == (224, 112)


def _resize_batches_for_test(pdf):
    """Mirror of the entry's self-contained closure for direct testing."""
    import io

    import pandas as pd

    try:
        from PIL import Image
    except ImportError:
        Image = None
    T = 224

    def _fit(w, h):
        if max(w, h) <= T:
            return w, h
        if w >= h:
            return T, max(1, (h * T) // w)
        return max(1, (w * T) // h), T

    def _dims(payload):
        if Image is not None:
            try:
                with Image.open(io.BytesIO(payload)) as im:
                    orig = im.size
                    im.thumbnail((T, T))
                    return *orig, *im.size
            except Exception:
                pass
        n = len(payload)
        w, h = (n % 640) + 1, ((n * 7) % 480) + 1
        return w, h, *_fit(w, h)

    rows = [_dims(p) for p in pdf["payload"]]
    out = pd.DataFrame(rows, columns=["in_w", "in_h", "out_w", "out_h"], dtype="int64")
    out.insert(0, "doc_id", pdf["doc_id"].values)
    out["n_out_bytes"] = out["out_w"] * out["out_h"] * 3
    yield out

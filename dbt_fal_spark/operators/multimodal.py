"""Multimodal column operators: opaque binary payloads + typed metadata.

Build-brief surface: treat image/audio/video as ``binary`` columns with
typed metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas``. The container has
no image/audio libraries, so the decode step is STUBBED (see
``decode_image``) — the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested.

The testdata has no binary table, so payloads are derived
deterministically from ``documents.text`` (utf-8 encode) — this keeps
the whole pipeline oracle-checkable where no real decoding is involved.

Scale notes (100 TB design):
- Binary payloads never shuffle in these plans: metadata extraction is a
  map-only projection; downstream joins move digests, not bytes.
- ``mapInPandas`` streams Arrow batches — peak executor memory is one
  batch of payloads, not one partition; cap
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` for jumbo blobs.
- For real corpora use ``spark.read.format("binaryFile")`` and keep
  payloads in their own column family / file set, joined by content key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_fal_spark.registry import query
from dbt_fal_spark.sources.readers import load_table


def decode_image(payload: bytes) -> dict:
    """Real image decode when a codec library exists (import-guarded: PIL
    if installed), else raises so nothing silently pretends to decode.
    Returns the same shape as ``fake_decode_meta``."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # container has no codec libraries
        raise NotImplementedError(
            "image decoding requires PIL/libvips (not installed)"
        ) from exc
    with Image.open(io.BytesIO(payload)) as im:
        return {
            "width": im.width,
            "height": im.height,
            "format": (im.format or "unknown").lower(),
        }


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic fake 'decode' used to exercise the pipeline: derives
    pseudo width/height/format from payload bytes."""
    n = len(payload)
    return {
        "width": (n % 640) + 1,
        "height": ((n * 7) % 480) + 1,
        "format": "png" if n % 2 == 0 else "jpeg",
    }


@query(
    "m_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           md5(substring(text, 1, 16)) AS head_md5,
           (octet_length(encode(text)) % 640) + 1 AS width,
           ((octet_length(encode(text)) * 7) % 480) + 1 AS height,
           CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def m_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column plumbing: payload digest, head-sample digest, and
    deterministic fake decode metadata — all JVM-side expressions. The
    md5-of-head mirrors frame-sampling (process a prefix, not the blob)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    n = F.length(payload)
    return docs.select(
        "doc_id",
        n.alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
        F.md5(F.substring(payload, 1, 16)).alias("head_md5"),
        ((n % 640) + 1).alias("width"),
        (((n * 7) % 480) + 1).alias("height"),
        F.when(n % 2 == 0, "png").otherwise("jpeg").alias("format"),
    )


@query(
    "m_decode_pipeline",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           (octet_length(encode(text)) % 640) + 1 AS width,
           ((octet_length(encode(text)) * 7) % 480) + 1 AS height,
           CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
    FROM documents
    WHERE text IS NOT NULL
    """,
    tags=("multimodal", "pandas-udf"),
)
def m_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real mapInPandas decode pipeline. Each payload first tries a
    REAL codec decode (PIL, import-guarded per worker — absent in this
    container); payloads that no codec recognizes (including this
    testdata's utf-8 text blobs) fall back to the deterministic fake,
    whose arithmetic is restated in SQL on the oracle side. So the gate
    certifies the Arrow plumbing — batch iteration, schema, row
    alignment — while a PIL-equipped environment exercises the real
    codec on real image bytes through the identical plan
    (tests/test_multimodal.py covers the PIL branch, skipped when the
    library is absent).

    Batches arrive as pandas DataFrames with a ``payload`` bytes column;
    each yields a metadata frame.
    """
    docs = load_table(spark, sf_dir, "documents")
    # missing blob = no decode work: null payloads are dropped (mirrored
    # in the oracle's WHERE) rather than fed to codecs
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(F.col("payload").isNotNull())
    return decode_pipeline(with_payload)


def decode_pipeline(with_payload: DataFrame) -> DataFrame:
    """(id, payload) → decode metadata via mapInPandas; real codec when
    available, deterministic fake for unrecognizable payloads."""

    # Self-contained closure: executor Python workers may not have this
    # package importable (the driver hands us an arbitrary SparkSession),
    # so the UDF must not reference module-level symbols — cloudpickle
    # serializes nested functions by value.
    def _fake_meta(payload: bytes) -> dict:
        n = len(payload)
        return {
            "width": (n % 640) + 1,
            "height": ((n * 7) % 480) + 1,
            "format": "png" if n % 2 == 0 else "jpeg",
        }

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # import once per worker, not per payload
            import io

            from PIL import Image
        except ImportError:
            Image = None

        def _meta(payload: bytes) -> dict:
            if Image is not None:
                try:
                    with Image.open(io.BytesIO(payload)) as im:
                        return {
                            "width": im.width,
                            "height": im.height,
                            "format": (im.format or "unknown").lower(),
                        }
                except Exception:
                    pass  # not an image this codec recognizes → fake path
            return _fake_meta(payload)

        for pdf in batches:
            metas = [_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "format": [m["format"] for m in metas],
                }
            )

    return with_payload.mapInPandas(
        decode_batch, schema="doc_id long, n_bytes int, width int, height int, format string"
    )


@query(
    "m_frame_sample",
    oracle="""
    WITH frames AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             unnest(generate_series(0, 3)) AS frame_no
      FROM documents
      WHERE octet_length(encode(text)) >= 64
    )
    SELECT f.doc_id AS doc_id, f.frame_no AS frame_no,
           CAST(f.frame_no * floor((f.n_bytes - 16) / 3.0) AS BIGINT) AS byte_offset,
           -- corpus is ASCII: byte slices == char slices (DuckDB has no
           -- BLOB substring), same identity m_binary_metadata relies on
           md5(substring(d.text,
                         CAST(f.frame_no * floor((f.n_bytes - 16) / 3.0) AS BIGINT) + 1,
                         16)) AS frame_md5
    FROM frames f, documents d
    WHERE f.doc_id = d.doc_id
    """,
    tags=("multimodal", "frames"),
)
def m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque binary payloads: each blob yields 4
    evenly-spaced 16-byte 'frames' (offset arithmetic + slice + digest) —
    one output row per frame. This is the video-keyframe shape: a
    generator expression (posexplode over computed offsets) fans each
    blob into frame rows WITHOUT shuffling the blob — the explode happens
    in the scan stage, and only the 16-byte slices' digests flow on.
    With a real codec, the slice+md5 becomes decode-at-offset inside the
    same mapInPandas pattern as m_decode_pipeline.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    base = docs.select("doc_id", payload.alias("payload")).filter(
        F.length(F.col("payload")) >= 64
    )
    stride = F.floor((F.length("payload") - 16) / 3.0)
    with_frames = base.select(
        "doc_id",
        "payload",
        F.posexplode(F.expr("array(0, 1, 2, 3)")).alias("frame_no", "_"),
    ).select(
        "doc_id",
        "frame_no",
        (F.col("frame_no") * stride).cast("long").alias("byte_offset"),
        F.md5(
            F.expr("substring(payload, cast(frame_no * floor((length(payload) - 16) / 3.0) as int) + 1, 16)")
        ).alias("frame_md5"),
    )
    return with_frames


CHUNK_BYTES = 64


@query(
    "m_chunk_dedup",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id, md5(substring(text, i, {CHUNK_BYTES})) AS dig
      FROM documents,
           unnest(generate_series(1, length(text), {CHUNK_BYTES})) AS t(i)
    ), df AS (SELECT dig, count(*) AS c FROM chunks GROUP BY dig)
    SELECT ch.doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(sum(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS dedup_ratio
    FROM chunks ch JOIN df USING (dig)
    GROUP BY ch.doc_id
    """,
    tags=("multimodal", "binary", "dedup"),
)
def m_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed-storage chunk dedup over the blob column: each
    payload splits into fixed 64-byte chunks, chunks are
    content-addressed by digest, and each doc reports how many of its
    chunks exist elsewhere — the restic/CDC-storage dedup-ratio readout,
    and the binary sibling of d_dup_ngram_fraction's token shingles.

    Plan: the chunk digests come from one codegen'd HOF (sequence with
    explicit +64 step — no descending-sequence hazard), so
    blobs never shuffle; the digest df aggregation map-side combines
    and the fold-back join is digest⋈digest. The chunk relation
    persists once for its two consumers.
    """
    docs = load_table(spark, sf_dir, "documents")
    chunks = (
        docs.select(
            "doc_id",
            # Spark's sequence(1, 0, 64) THROWS (illegal boundaries) where
            # DuckDB's generate_series yields nothing — guard empty blobs
            F.explode(
                F.expr(
                    "CASE WHEN length(text) < 1 THEN array() ELSE "
                    f"transform(sequence(1, length(text), {CHUNK_BYTES}),"
                    f" i -> md5(substring(text, i, {CHUNK_BYTES}))) END"
                )
            ).alias("dig"),
        )
        .persist()
    )
    df = chunks.groupBy("dig").agg(F.count("*").alias("c"))
    dup = F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
    return (
        chunks.join(df, "dig")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            dup.cast("bigint").alias("n_dup_chunks"),
            (dup.cast("double") / F.count("*")).alias("dedup_ratio"),
        )
    )


THUMB = 224  # classic preprocessing box; must match the oracle SQL


@query(
    "m_resize_pipeline",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             (octet_length(encode(text)) % 640) + 1 AS in_w,
             ((octet_length(encode(text)) * 7) % 480) + 1 AS in_h
      FROM documents
      WHERE text IS NOT NULL
    ),
    sized AS (
      SELECT doc_id, in_w, in_h,
             CASE WHEN GREATEST(in_w, in_h) <= {THUMB} THEN in_w
                  WHEN in_w >= in_h THEN {THUMB}
                  ELSE GREATEST(1, (in_w * {THUMB}) // in_h) END AS out_w,
             CASE WHEN GREATEST(in_w, in_h) <= {THUMB} THEN in_h
                  WHEN in_w >= in_h THEN GREATEST(1, (in_h * {THUMB}) // in_w)
                  ELSE {THUMB} END AS out_h
      FROM dims
    )
    SELECT doc_id,
           CAST(in_w AS BIGINT) AS in_w, CAST(in_h AS BIGINT) AS in_h,
           CAST(out_w AS BIGINT) AS out_w, CAST(out_h AS BIGINT) AS out_h,
           CAST(out_w * out_h * 3 AS BIGINT) AS n_out_bytes
    FROM sized
    """,
    tags=("multimodal", "resize", "pandas-udf"),
)
def m_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize (aspect-preserving thumbnail into a 224x224 box, never
    upscaling) over opaque binary payloads — the remaining op of the
    brief's decode / feature-extract / resize / frame-sample quartet.
    Same certification pattern as m_decode_pipeline: each payload first
    tries a REAL PIL decode + Image.thumbnail (import-guarded per
    worker); unrecognizable payloads (all of this testdata) fall back to
    the deterministic fake whose INTEGER thumbnail arithmetic —
    out = 224 on the long side, GREATEST(1, short*224 div long) on the
    short side — is restated exactly in the oracle SQL, so the gate
    certifies the Arrow plumbing and the resize math while a
    PIL-equipped environment runs the real op through the identical
    plan. n_out_bytes is the RGB buffer size of the resized frame (the
    number that drives downstream batch-memory budgeting at 100 TB).
    Map-only: blobs never shuffle; only dims flow on."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(F.col("payload").isNotNull())

    def resize_batch(batches):
        # self-contained: executors may not be able to import this package
        import pandas as pd

        try:
            import io

            from PIL import Image
        except ImportError:
            Image = None

        T = 224  # keep in sync with THUMB/oracle (closure must be self-contained)

        def _fit(w: int, h: int) -> tuple[int, int]:
            if max(w, h) <= T:
                return w, h
            if w >= h:
                return T, max(1, (h * T) // w)
            return max(1, (w * T) // h), T

        def _dims(payload: bytes) -> tuple[int, int, int, int]:
            if Image is not None:
                try:
                    with Image.open(io.BytesIO(payload)) as im:
                        orig = im.size  # thumbnail() mutates in place
                        im.thumbnail((T, T))  # real resize, real dims
                        return *orig, *im.size  # type: ignore[return-value]
                except Exception:
                    pass  # not an image this codec recognizes → fake path
            n = len(payload)
            w, h = (n % 640) + 1, ((n * 7) % 480) + 1
            return w, h, *_fit(w, h)

        for pdf in batches:
            rows = [_dims(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                rows, columns=["in_w", "in_h", "out_w", "out_h"], dtype="int64"
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out["n_out_bytes"] = out["out_w"] * out["out_h"] * 3
            yield out

    return with_payload.mapInPandas(
        resize_batch,
        schema="doc_id long, in_w long, in_h long, out_w long, out_h long, n_out_bytes long",
    )


@query(
    "m_byte_histogram_features",
    oracle="""
    WITH pos AS (
      SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
      FROM documents
      WHERE text IS NOT NULL AND length(text) > 0
    )
    SELECT doc_id,
           CAST(ascii(substring(text, i, 1)) // 16 AS BIGINT) AS bin,
           count(*) AS n
    FROM pos
    GROUP BY doc_id, bin
    """,
    tags=("multimodal", "features", "pandas-udf"),
)
def m_byte_histogram_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over opaque binary payloads — the explicit
    feature-extract member of the brief's decode / feature-extract /
    resize / frame-sample quartet. Each payload yields its 16-bin
    byte-class histogram (bin = byte >> 4): the standard cheap content
    signature behind format sniffing, charset detection, and
    binary-vs-text classification in curation pipelines. Counts are
    INTEGER (no normalization) so the oracle compare is exact; rows are
    (doc_id, bin, n) with zero bins absent — the sparse layout both
    engines produce naturally. The histogram is computed with
    numpy frombuffer + bincount over Arrow batches (vectorized, no
    per-byte Python); the oracle re-derives it per-character, valid
    because the corpus is ASCII (byte == char code — the same identity
    m_frame_sample relies on). Map-only: blobs never shuffle; 16
    numbers per doc flow on."""
    import numpy as np  # noqa: F401 — imported in the closure too

    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(F.length(F.col("payload")) > 0)

    def hist_batch(batches):
        # self-contained: executors may not be able to import this package
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, bins, counts = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                h = np.bincount(
                    np.frombuffer(payload, dtype=np.uint8) >> 4, minlength=16
                )
                nz = np.nonzero(h)[0]
                ids.extend([doc_id] * len(nz))
                bins.extend(nz.tolist())
                counts.extend(h[nz].tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "bin": pd.Series(bins, dtype="int64"),
                    "n": pd.Series(counts, dtype="int64"),
                }
            )

    return with_payload.mapInPandas(hist_batch, schema="doc_id long, bin long, n long")

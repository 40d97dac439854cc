"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

Training-data pipeline surface (build brief): brute-force cosine top-k
as the exact baseline, and a random-hyperplane LSH bucketed variant as
the scale path.

Determinism: embeddings are quantized to round(x*1024) BIGINTs so dot
products / norms are exact integer math in both engines (see dedup.py);
LSH hyperplane weights are md5-derived integer literals computed at
import time in Python and embedded identically into the Spark
expressions and the DuckDB oracle SQL — one source of truth.

Scale notes (100 TB design):
- Brute force is O(nq·n) but shuffle-free: the query set is broadcast,
  each partition scores its own vectors and keeps a local top-k
  (window over query_id partitions = TakeOrdered per query).
- The LSH variant buckets both sides on 8 sign bits; the join is an
  equi-join on bucket id, so candidates per query drop ~256× while
  recall follows the standard SRP-LSH curve. More planes/tables =
  recall knob, all still equi-joins.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dbt_fal_spark.registry import query
from dbt_fal_spark.sources.readers import load_table, spread

DIM = 64
N_PLANES = 8
N_QUERIES = 10  # vectors with vec_id < 10 act as the query set
TOP_K = 10

_SPARK_QVEC = "transform(embedding, x -> cast(round(x * 1024) as bigint))"
_ORACLE_QVEC = "list_transform(embedding, x -> CAST(round(x * 1024) AS BIGINT))"

# Input contract shared by every embedding consumer: null, null-element,
# or non-finite vectors are INVALID INPUT and are excluded before any
# quantization — the ANSI cast of round(NaN·1024) errors in BOTH engines,
# and an Inf component would otherwise leak an inf-cosine garbage pair out
# of the numpy stages. The `x IS NULL` disjunct makes the predicate
# two-valued: without it, exists() over a [0.1, NULL, ...] vector returns
# NULL (three-valued logic) and Spark filters the row while DuckDB's
# list_filter-based oracle keeps it. Both engines now drop such vectors.
# Cost: one short-circuiting exists() per vector at scan.
FINITE_EMB = (
    "embedding IS NOT NULL AND NOT exists(embedding,"
    " x -> x IS NULL OR isnan(x) OR abs(x) = double('Infinity'))"
)
# Arrow stages quantize with the numpy twin sign(x)·floor(|x·1024|+0.5)
# instead of running the interpreted transform() HOF over the full corpus:
# float32·1024 is an exact exponent shift and round() is HALF_UP in both
# engines, so the numpy form is bit-identical to _SPARK_QVEC/_ORACLE_QVEC.


def _plane_weight(p: int, d: int) -> int:
    """Deterministic integer weight in [-1000, 1000] for plane p, dim d."""
    h = int(hashlib.md5(f"plane-{p}-dim-{d}".encode()).hexdigest()[:8], 16)
    return h % 2001 - 1000


PLANES = [[_plane_weight(p, d) for d in range(DIM)] for p in range(N_PLANES)]


def _oracle_bucket_expr() -> str:
    terms = []
    for p, w in enumerate(PLANES):
        arr = ", ".join(str(x) for x in w)
        dot = f"list_dot_product(qv, [{arr}]::BIGINT[])"
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


@query(
    "s_knn_bruteforce",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, {_ORACLE_QVEC} AS qv FROM embeddings WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0
    ), n AS (
      SELECT vec_id, label, qv, list_dot_product(qv, qv) AS nrm FROM q
    ), scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label AS neighbor_label,
             CAST(list_dot_product(a.qv, b.qv) AS DOUBLE) / (sqrt(a.nrm) * sqrt(b.nrm)) AS cosine
      FROM n a JOIN n b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine, rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t
    WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "knn"),
)
def s_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k, Arrow-vectorized: broadcast the (tiny) query
    matrix, each Arrow batch of the corpus matmuls against it in numpy
    and keeps only its local top-k per query, then one narrow global
    window ranks the ~k·batches survivors. Shuffle-free scoring — the
    same shape scales to 1000 executors (per-partition TakeOrdered,
    then a driver-sized merge).

    Exactness: quantized values |q| ≤ ~2^13, so every product ≤ 2^26 and
    every 64-term dot < 2^33 — integer-exact in float64, and the division
    is shaped exactly like the oracle's (sqrt(a)·sqrt(b), not sqrt(ab)).
    """
    import numpy as np

    knn_schema = "query_id long, neighbor_id long, neighbor_label long, cosine double"
    emb = load_table(spark, sf_dir, "embeddings")
    raw = emb.filter(F.expr(FINITE_EMB)).select("vec_id", "label", "embedding")
    q = emb.filter(F.expr(FINITE_EMB)).select(
        "vec_id", "label", F.expr(_SPARK_QVEC).alias("qv")
    )
    qrows = q.filter(F.col("vec_id") < N_QUERIES).collect()
    if not qrows:
        return spark.createDataFrame([], knn_schema + ", rank int")
    qrows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["qv"] for r in qrows], dtype=np.float64)
    q_nrm = (q_mat * q_mat).sum(axis=1)
    b_qids = spark.sparkContext.broadcast(q_ids)
    b_qmat = spark.sparkContext.broadcast(q_mat)
    b_qnrm = spark.sparkContext.broadcast(q_nrm)
    top_k = TOP_K

    def local_topk(batches):
        # mapInArrow: the embedding column arrives as ONE flat zero-copy
        # float buffer per batch — no per-row list objects (measured hot
        # spot at 1M+ rows, tools/ann_scale_bench.py)
        import pyarrow as pa

        qids, qmat, qnrm = b_qids.value, b_qmat.value, b_qnrm.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            idx = batch.schema.get_field_index
            n_ids = batch.column(idx("vec_id")).to_numpy().astype(np.int64)
            n_labels = batch.column(idx("label")).to_numpy().astype(np.int64)
            flat = batch.column(idx("embedding")).flatten().to_numpy(zero_copy_only=False)
            e = flat.astype(np.float64).reshape(batch.num_rows, -1)
            e *= 1024.0
            n_mat = np.sign(e) * np.floor(np.abs(e) + 0.5)  # == round() HALF_UP
            n_nrm = np.einsum("ij,ij->i", n_mat, n_mat)
            cos = (qmat @ n_mat.T) / (np.sqrt(qnrm)[:, None] * np.sqrt(n_nrm)[None, :])
            out_q, out_n, out_l, out_c = [], [], [], []
            for qi in range(len(qids)):
                row = cos[qi]
                mask = n_ids != qids[qi]
                cand = np.nonzero(mask)[0]
                if len(cand) > top_k:
                    # top-k by (-cosine, neighbor_id): lexsort is stable
                    order = np.lexsort((n_ids[cand], -row[cand]))[:top_k]
                    cand = cand[order]
                out_q.append(np.full(len(cand), qids[qi]))
                out_n.append(n_ids[cand])
                out_l.append(n_labels[cand])
                out_c.append(row[cand])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q)),
                    pa.array(np.concatenate(out_n)),
                    pa.array(np.concatenate(out_l)),
                    pa.array(np.concatenate(out_c)),
                ],
                names=["query_id", "neighbor_id", "neighbor_label", "cosine"],
            )

    scored = spread(raw).mapInArrow(local_topk, schema=knn_schema)
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOP_K)


@query(
    "s_knn_lsh_bucketed",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, {_ORACLE_QVEC} AS qv FROM embeddings WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0
    ), n AS (
      SELECT vec_id, label, qv, list_dot_product(qv, qv) AS nrm,
             {_oracle_bucket_expr()} AS bucket
      FROM q
    ), scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label AS neighbor_label,
             a.bucket AS bucket,
             CAST(list_dot_product(a.qv, b.qv) AS DOUBLE) / (sqrt(a.nrm) * sqrt(b.nrm)) AS cosine
      FROM n a JOIN n b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, neighbor_label, bucket, cosine, rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t
    WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "knn", "lsh"),
)
def s_knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH (8 sign bits) buckets
    both sides; candidates only meet inside their bucket. Recall < 1 by
    design — s_knn_bruteforce is the oracle to measure it against.

    Shape (r7, after the 1.25M-vector paired bench exposed the old
    bucket-join plan): the N_QUERIES query vectors are collected (a
    bounded driver read — the query set is tiny BY CONTRACT) and ride
    into ONE Arrow pass over the corpus that quantizes, buckets, and
    scores matching rows per batch with numpy matmuls, emitting ONLY
    bucket-matched (query, neighbor, cosine) rows. The corpus streams
    through Python once and nothing corpus-sized comes back: no
    quantized-vector arrays through Arrow, no persist, no join — the
    only shuffle is the final per-query top-k window over the ~N/2^8
    surviving candidates. (The previous plan materialized + persisted
    the full int64-quantized corpus just to equi-join it against 10
    broadcast queries: 640 MB of Arrow traffic per 1.25M rows, 5.6× the
    total runtime of this plan at that size — tools/ann_scale_bench.py.)

    Exactness vs the SQL oracle: quantization is sign·floor(|x·1024|+.5)
    == round() HALF_UP in both engines (np.round is banker's — avoided);
    |qv| ≤ 2^13 and plane weights ≤ 2^10 keep every dot integer-exact;
    the int64 dot and IEEE double divide/sqrt are the identical
    operation sequence DuckDB runs."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    raw = emb.filter(F.expr(FINITE_EMB)).select("vec_id", "label", "embedding")
    planes = np.array(PLANES, dtype=np.float64)  # (8, 64); pickled by value
    bits = np.array([1 << p for p in range(N_PLANES)], dtype=np.int64)

    def _quant(e: "np.ndarray") -> "np.ndarray":
        # integral float64, NOT int64: every later product stays < 2^53
        # (dots < 2^33) so float64 is exact, and float64 matmuls hit
        # BLAS while int64 takes numpy's slow generic loop
        e = e * 1024.0
        out = np.abs(e)
        out += 0.5
        np.floor(out, out=out)
        out *= np.sign(e)  # == round() HALF_UP
        return out

    out_schema = "query_id long, neighbor_id long, neighbor_label long, bucket long, cosine double"
    qrows = raw.filter(F.col("vec_id") < N_QUERIES).collect()
    if not qrows:
        # must match the normal return path's schema, which adds rank
        return spark.createDataFrame([], out_schema + ", rank int")
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qm = _quant(np.array([r["embedding"] for r in qrows], dtype=np.float64))
    q_nrm = (qm * qm).sum(axis=1)
    q_bucket = ((qm @ planes.T) > 0) @ bits

    def score(batches):
        # mapInArrow: the embedding column is read as ONE flat zero-copy
        # float buffer per batch (no per-row list objects — at 1.25M×64
        # that materialization was the hot spot of the pandas variant)
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            emb_col = batch.column(batch.schema.get_field_index("embedding"))
            flat = emb_col.flatten().to_numpy(zero_copy_only=False)
            m = _quant(flat.astype(np.float64).reshape(batch.num_rows, -1))
            nrm = np.einsum("ij,ij->i", m, m)  # exact: per-row ≤ 2^32
            bucket = ((m @ planes.T) > 0) @ bits
            ids = batch.column(batch.schema.get_field_index("vec_id")).to_numpy()
            labels = batch.column(batch.schema.get_field_index("label")).to_numpy()
            cols = {k: [] for k in ("query_id", "neighbor_id", "neighbor_label", "bucket", "cosine")}
            for qi in range(len(q_ids)):
                mask = (bucket == q_bucket[qi]) & (ids != q_ids[qi])
                if not mask.any():
                    continue
                dots = m[mask] @ qm[qi]  # integral float64 — exact
                cos = dots / (np.sqrt(float(q_nrm[qi])) * np.sqrt(nrm[mask]))
                n_hit = int(mask.sum())
                cols["query_id"].append(np.full(n_hit, q_ids[qi], dtype=np.int64))
                cols["neighbor_id"].append(ids[mask].astype(np.int64))
                cols["neighbor_label"].append(labels[mask].astype(np.int64))
                cols["bucket"].append(np.full(n_hit, q_bucket[qi], dtype=np.int64))
                cols["cosine"].append(cos)
            if cols["query_id"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.concatenate(v)) for v in cols.values()],
                    names=list(cols.keys()),
                )

    scored = spread(raw).mapInArrow(score, schema=out_schema)
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOP_K)


@query(
    "s_label_centroid_distance",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, {_ORACLE_QVEC} AS qv FROM embeddings WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0
    ), expl AS (
      SELECT label, unnest(generate_series(1, {DIM})) AS d, qv FROM q
    ), comp AS (
      SELECT label, d, qv[d] AS v FROM expl
    ), cent AS (
      SELECT label, d, sum(v) AS s, count(*) AS n FROM comp GROUP BY label, d
    )
    SELECT label,
           n AS n_vectors,
           CAST(sum(s * s) AS DOUBLE) / (n * n) AS centroid_sq_norm
    FROM cent
    GROUP BY label, n
    """,
    tags=("similarity", "centroid"),
)
def s_label_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid squared norm — the IVF coarse-quantizer build
    step (centroid = mean of member vectors; exact integer sums, one
    final double division)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # the CASE guard matters, not just the filter: posexplode's inferred
    # constraints (size(qv) > 0) replicate the transform-cast into the
    # Filter node where codegen evaluates it on UNfiltered rows — a NaN
    # component would hit the ANSI cast before the finite predicate
    # prunes the row
    q = emb.filter(F.expr(FINITE_EMB)).select(
        "vec_id",
        "label",
        F.expr(f"CASE WHEN {FINITE_EMB} THEN {_SPARK_QVEC} ELSE NULL END").alias("qv"),
    )
    comp = q.select("label", F.posexplode("qv").alias("d", "v"))
    cent = comp.groupBy("label", "d").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    return cent.groupBy("label", "n").agg(
        (F.sum(F.col("s") * F.col("s")).cast("double") / (F.col("n") * F.col("n"))).alias("centroid_sq_norm")
    ).select("label", F.col("n").alias("n_vectors"), "centroid_sq_norm")


N_PROBE = 2  # IVF probe width


@query(
    "s_knn_ivf",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, {_ORACLE_QVEC} AS qv FROM embeddings WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0
    ), n AS (
      SELECT vec_id, label, qv, list_dot_product(qv, qv) AS nrm FROM q
    ), comp AS (
      SELECT label, unnest(generate_series(1, {DIM})) AS d, qv FROM q
    ), cent AS (  -- exact integer centroid numerators: c_l = s_l / n_l
      SELECT label AS c_label, d, sum(qv[d]) AS s, count(*) AS cnt
      FROM (SELECT label, d, qv FROM comp) GROUP BY label, d
    ), cvec AS (
      SELECT c_label, cnt, list(s ORDER BY d) AS sv FROM cent GROUP BY c_label, cnt
    ), dist AS (  -- ||x - s/n||^2 = ||x||^2 - 2 x.s/n + ||s||^2/n^2, all terms exact
      SELECT n.vec_id, n.label, n.qv, n.nrm, c.c_label,
             CAST(n.nrm AS DOUBLE)
               - 2.0 * CAST(list_dot_product(n.qv, c.sv) AS DOUBLE) / c.cnt
               + CAST(list_dot_product(c.sv, c.sv) AS DOUBLE) / (c.cnt * c.cnt) AS d2
      FROM n CROSS JOIN cvec c
    ), assign AS (  -- coarse quantization: nearest centroid (min label tiebreak)
      SELECT vec_id, label, qv, nrm, c_label AS cell
      FROM (SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY d2, c_label) AS rn FROM dist) t
      WHERE rn = 1
    ), probes AS (  -- each query probes its N_PROBE nearest cells
      SELECT vec_id AS query_id, c_label AS cell
      FROM (SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY d2, c_label) AS rn FROM dist) t
      WHERE rn <= {N_PROBE} AND vec_id < {N_QUERIES}
    ), scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, a.label AS neighbor_label, a.cell,
             CAST(list_dot_product(qq.qv, a.qv) AS DOUBLE) / (sqrt(qq.nrm) * sqrt(a.nrm)) AS cosine
      FROM probes p
      JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
      JOIN n qq ON qq.vec_id = p.query_id
    )
    SELECT query_id, neighbor_id, neighbor_label, cell, cosine, rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t
    WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "knn", "ivf"),
)
def s_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize every vector to its
    nearest centroid cell, probe the N_PROBE nearest cells per query,
    score only inside probed cells. Completes the ANN triad
    (s_knn_bruteforce = exact baseline, s_knn_lsh_bucketed = hash
    buckets, here = learned-ish cells): candidates per query drop to
    ~(probed cells / all cells) of the corpus, and the cell assignment is
    ONE broadcast join — the structure that scales to billions of
    vectors with k-means centroids.

    Determinism: centroids stay as exact integer (sum, count) pairs —
    never a float mean — so every distance term (||x||², x·s/n, ||s||²/n²)
    is a single double op on exact integers, bit-identical across engines
    and partition orders. Label groups stand in for k-means cells (the
    synthetic labels ARE clusters); swapping in Lloyd iterations changes
    the centroid builder, not the query plan.
    """
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    # ONE cached scan feeds both passes (codebook build, then scoring):
    # the parquet decode happens once and the second pass reads executor-
    # memory blocks. At real corpus sizes this cache is the IVF *index
    # build* — you'd persist the quantized/assigned corpus anyway; here it
    # is the raw batch, released with the session (bench clears per query).
    base = spread(emb.filter(F.expr(FINITE_EMB)).select("vec_id", "label", "embedding")).persist()
    # Codebook build + query extraction fused into ONE pass: exact integer
    # (sum-vector, count) per cell, and the N_QUERIES query rows ride the
    # same output (kind=1) — collected to the driver together (k cells ×
    # DIM ints + nq vectors: driver-sized BY DESIGN, an IVF coarse
    # quantizer is always tiny relative to the corpus) and shipped in the
    # scoring closure, so cell assignment below is pure map-side compute —
    # no per-vector shuffle, no separate query-collection job. The partial
    # sums are map-side numpy (k×DIM int64 per batch) merged on the driver
    # — no 64×-row posexplode shuffle, which at 100 TB would be the single
    # biggest data movement in the query. (An r6 experiment replaced this
    # pass with a 130-expression codegen'd JVM aggregation: correct, but
    # the generated-code compile alone cost ~1-1.5 s/plan — the Arrow
    # partial pass is strictly faster at every scale tested.)
    n_queries = N_QUERIES

    def partials_and_queries(batches):
        # mapInArrow: flat zero-copy embedding buffer in; the output is
        # k cells + nq query rows — partition-tiny by construction
        import pyarrow as pa

        acc: dict = {}
        qids: list = []
        qlbl: list = []
        qvec: list = []
        for batch in batches:
            if batch.num_rows == 0:
                continue
            idx = batch.schema.get_field_index
            flat = batch.column(idx("embedding")).flatten().to_numpy(zero_copy_only=False)
            e = flat.astype(np.float64).reshape(batch.num_rows, -1)
            e *= 1024.0
            m = (np.sign(e) * np.floor(np.abs(e) + 0.5)).astype(np.int64)
            labels = batch.column(idx("label")).to_numpy().astype(np.int64)
            ids = batch.column(idx("vec_id")).to_numpy().astype(np.int64)
            for i in np.nonzero(ids < n_queries)[0]:
                qids.append(int(ids[i]))
                qlbl.append(int(labels[i]))
                qvec.append(m[i])
            for lbl in np.unique(labels):
                sel = m[labels == lbl]
                cnt, vec = acc.get(int(lbl), (0, 0))
                acc[int(lbl)] = (cnt + len(sel), vec + sel.sum(axis=0, dtype=np.int64))
        if acc or qids:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([0] * len(acc) + [1] * len(qids), type=pa.int32()),
                    pa.array(list(acc) + qlbl, type=pa.int64()),
                    pa.array([c for c, _ in acc.values()] + [0] * len(qids), type=pa.int64()),
                    pa.array(
                        [v.tolist() if hasattr(v, "tolist") else v for _, v in acc.values()]
                        + [v.tolist() for v in qvec],
                        type=pa.list_(pa.int64()),
                    ),
                    pa.array([0] * len(acc) + qids, type=pa.int64()),
                ],
                names=["kind", "label", "cnt", "sv", "vec_id"],
            )

    merged: dict = {}
    qrow_map: dict = {}
    for r in base.mapInArrow(
        partials_and_queries,
        schema="kind int, label long, cnt long, sv array<long>, vec_id long",
    ).collect():
        if r["kind"] == 1:
            qrow_map[r["vec_id"]] = r["sv"]
            continue
        cnt, vec = merged.get(r["label"], (0, None))
        sv = np.array(r["sv"], dtype=np.int64)
        merged[r["label"]] = (cnt + r["cnt"], sv if vec is None else vec + sv)
    codebook = sorted(
        (lbl, cnt, [int(x) for x in vec]) for lbl, (cnt, vec) in merged.items()
    )
    if not codebook:
        return spark.createDataFrame(
            [],
            "query_id long, neighbor_id long, neighbor_label long, "
            "cell long, cosine double, rank int",
        )
    # Everything per-row runs as ONE Arrow numpy stage against the broadcast
    # codebook + broadcast query matrix — exactly the s_knn_bruteforce
    # pattern, with a cell mask instead of full scoring. Each batch does:
    # (a) d2 vs all cells in one (N×64)@(64×k) matmul, (b) stable argsort
    # (cells pre-sorted by label == ORDER BY d2, c_label tiebreak),
    # (c) one (nq×64)@(64×N) cosine matmul masked to rows whose assigned
    # cell is probed by each query, (d) local top-k. No join ships vectors
    # anywhere; the only shuffle is the k·batches survivors into the final
    # rank window. d2 = ||x||² - 2·x·s/n + ||s||²/n², each term one double
    # op on exact integers (sums < 2^50 << 2^53), bit-identical to the
    # oracle's CAST(...AS DOUBLE) terms.
    c_labels = np.array([c[0] for c in codebook], dtype=np.int64)  # sorted
    c_cnt = np.array([c[1] for c in codebook], dtype=np.float64)
    c_sv = np.array([c[2] for c in codebook], dtype=np.float64)  # (k, DIM)
    c_ssv = np.array([float(sum(x * x for x in c[2])) for c in codebook])

    def cells_for(m: "np.ndarray", nrm: "np.ndarray") -> "np.ndarray":
        """Stable (d2, label)-ordered cell indices per row: (N, k)."""
        d2 = nrm[:, None] - 2.0 * (m @ c_sv.T) / c_cnt[None, :] + (c_ssv / (c_cnt * c_cnt))[None, :]
        return np.argsort(d2, axis=1, kind="stable")

    # Query side: N_QUERIES rows by contract — driver-sized, already
    # extracted by the fused pass above. Probed cells are computed once.
    qrows = sorted(qrow_map.items())
    empty_schema = (
        "query_id long, neighbor_id long, neighbor_label long, "
        "cell long, cosine double, rank int"
    )
    if not qrows:
        return spark.createDataFrame([], empty_schema)
    q_ids = np.array([vid for vid, _ in qrows], dtype=np.int64)
    q_mat = np.array([qv for _, qv in qrows], dtype=np.float64)
    q_nrm = (q_mat * q_mat).sum(axis=1)
    # (nq, k) bool: does query qi probe cell index ci?
    probe_mask = np.zeros((len(q_ids), len(c_labels)), dtype=bool)
    for qi, cell_order in enumerate(cells_for(q_mat, q_nrm)):
        probe_mask[qi, cell_order[:N_PROBE]] = True
    b_q = spark.sparkContext.broadcast((q_ids, q_mat, q_nrm, probe_mask))
    top_k = TOP_K

    def local_topk(batches):
        import pyarrow as pa

        qids, qmat, qnrm, pmask = b_q.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            idx = batch.schema.get_field_index
            n_ids = batch.column(idx("vec_id")).to_numpy().astype(np.int64)
            n_labels = batch.column(idx("label")).to_numpy().astype(np.int64)
            flat = batch.column(idx("embedding")).flatten().to_numpy(zero_copy_only=False)
            e = flat.astype(np.float64).reshape(batch.num_rows, -1)
            e *= 1024.0
            m = np.sign(e) * np.floor(np.abs(e) + 0.5)  # == round() HALF_UP
            nrm = np.einsum("ij,ij->i", m, m)
            cell_idx = cells_for(m, nrm)[:, 0]
            cos = (qmat @ m.T) / (np.sqrt(qnrm)[:, None] * np.sqrt(nrm)[None, :])
            cols = {k: [] for k in ("query_id", "neighbor_id", "neighbor_label", "cell", "cosine")}
            for qi in range(len(qids)):
                cand = np.nonzero(pmask[qi, cell_idx] & (n_ids != qids[qi]))[0]
                row = cos[qi]
                if len(cand) > top_k:
                    cand = cand[np.lexsort((n_ids[cand], -row[cand]))[:top_k]]
                cols["query_id"].append(np.full(len(cand), qids[qi], dtype=np.int64))
                cols["neighbor_id"].append(n_ids[cand])
                cols["neighbor_label"].append(n_labels[cand])
                cols["cell"].append(c_labels[cell_idx[cand]].astype(np.int64))
                cols["cosine"].append(row[cand])
            if cols["query_id"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.concatenate(v)) for v in cols.values()],
                    names=list(cols.keys()),
                )

    scored = base.mapInArrow(
        local_topk,
        schema="query_id long, neighbor_id long, neighbor_label long, cell long, cosine double",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOP_K)


@query(
    "s_knn_int8",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, {_ORACLE_QVEC} AS qv FROM embeddings WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0
    ), stats AS (
      SELECT list_value({', '.join(f'min(qv[{i + 1}])' for i in range(DIM))}) AS mn,
             list_value({', '.join(f'max(qv[{i + 1}])' for i in range(DIM))}) AS mx
      FROM q
    ), spans AS (
      SELECT list_transform(generate_series(1, {DIM}),
               i -> greatest(mx[i] - mn[i], 1)) AS sp
      FROM stats
    ), codes AS (
      SELECT vec_id, label, qv,
             list_transform(generate_series(1, {DIM}),
               i -> ((qv[i] - mn[i]) * 255) // greatest(mx[i] - mn[i], 1)) AS code
      FROM q, stats
    ), scored AS (
      -- ADC ranking: q·x̂ up to a query-constant — raw query ints against
      -- span-rescaled neighbor codes (decoded dot minus Σ qv·mn, which is
      -- identical for every neighbor of a given query)
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             b.label AS neighbor_label,
             CAST(list_dot_product(a.qv,
               list_transform(generate_series(1, {DIM}),
                 i -> b.code[i] * sp[i])) AS BIGINT) AS qscore
      FROM codes a JOIN codes b ON b.vec_id <> a.vec_id
      CROSS JOIN spans
      WHERE a.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, neighbor_label, qscore, rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY qscore DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t
    WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "knn", "quantization"),
)
def s_knn_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ8) top-k with ADC ranking: each dimension is
    linearly mapped to an 8-bit code using the corpus-wide per-dim
    min/max — the FAISS ``SQ8``-style compression path that cuts vector
    bytes 4× (at 100 TB of embeddings, 4× less shuffle/scan is the
    difference between fitting in cluster memory or not). Ranking is
    asymmetric-distance style: the RAW integer query against the
    span-rescaled neighbor codes, i.e. the reconstructed dot q·x̂ minus
    a per-query constant (Σ qv·mn) that cannot change the order —
    reconstruction error is then the ONLY ranking distortion (a
    shifted-code·code dot, the naive alternative, adds an affine
    per-dim rescale that measurably hurt recall:
    tests/test_ann_recall.py).

    Plan (2 bounded jobs, the s_knn_ivf fused shape): (1) ONE Arrow
    pass over a persisted scan emits per-batch per-dim min/max partials
    (64 tiny dim-keyed rows per batch — the global reduce is a
    64-group aggregation, never a full-corpus collect) AND the
    N_QUERIES query vectors riding the same output (kind=1), encoded
    driver-side once the stats land; (2) the scoring pass re-reads the
    cached scan, re-quantizes each batch with the broadcast stats,
    matmuls int codes against the broadcast query codes, and keeps a
    local top-k, leaving one narrow global rank window. (The r6
    JVM-aggregation experiment — 129 codegen'd min/max expressions —
    was correct but paid ~1 s of generated-code compilation per plan;
    see s_knn_ivf. Two Arrow passes over the cached scan IS the floor
    for exact SQ8: scoring cannot start before the global stats
    exist.)

    Exactness: quantization is pure integer math — ``(qv - mn) * 255
    // max(mx - mn, 1)`` with a non-negative numerator, so numpy int64
    floor-division, DuckDB ``//`` and Spark ``div`` all agree; code
    dot products are ≤ 255²·64 < 2^22, exact everywhere."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    raw = spread(emb.filter(F.expr(FINITE_EMB)).select("vec_id", "label", "embedding")).persist()
    out_schema = "query_id long, neighbor_id long, neighbor_label long, qscore long, rank int"
    n_queries = N_QUERIES

    def partials_and_queries(batches):
        # mapInArrow: flat zero-copy embedding buffer in; output is DIM
        # stats rows + the contract-tiny query rows per batch
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            idx = batch.schema.get_field_index
            flat = batch.column(idx("embedding")).flatten().to_numpy(zero_copy_only=False)
            e = flat.astype(np.float64).reshape(batch.num_rows, -1)
            e *= 1024.0
            m = (np.sign(e) * np.floor(np.abs(e) + 0.5)).astype(np.int64)
            ids = batch.column(idx("vec_id")).to_numpy().astype(np.int64)
            qsel = np.nonzero(ids < n_queries)[0]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([0] * m.shape[1] + [1] * len(qsel), type=pa.int32()),
                    pa.array(list(range(m.shape[1])) + ids[qsel].tolist(), type=pa.int64()),
                    pa.array(m.min(axis=0).tolist() + [0] * len(qsel), type=pa.int64()),
                    pa.array(m.max(axis=0).tolist() + [0] * len(qsel), type=pa.int64()),
                    pa.array(
                        [None] * m.shape[1] + [v.tolist() for v in m[qsel]],
                        type=pa.list_(pa.int64()),
                    ),
                ],
                names=["kind", "d", "mn", "mx", "qv"],
            )

    fused = (
        raw.mapInArrow(
            partials_and_queries,
            schema="kind int, d long, mn long, mx long, qv array<long>",
        )
        .collect()
    )
    stats_rows = [r for r in fused if r["kind"] == 0]
    if not stats_rows:
        return spark.createDataFrame([], out_schema)
    mn = np.full(DIM, 2**62, dtype=np.int64)
    mx = np.full(DIM, -(2**62), dtype=np.int64)
    for r in stats_rows:
        mn[r["d"]] = min(mn[r["d"]], r["mn"])
        mx[r["d"]] = max(mx[r["d"]], r["mx"])
    span = np.maximum(mx - mn, 1)

    qrows = sorted((r["d"], r["qv"]) for r in fused if r["kind"] == 1)
    if not qrows:
        # non-empty corpus, empty query set: nothing to rank (and the
        # (0,)-shaped matrix would not broadcast against the stats)
        return spark.createDataFrame([], out_schema)
    q_ids = np.array([vid for vid, _ in qrows], dtype=np.int64)
    # ADC: the query stays raw; neighbors decode as code*span (+ mn, a
    # per-query additive constant dropped from the ranking)
    q_codes = np.array([qv for _, qv in qrows], dtype=np.int64)
    b_q = spark.sparkContext.broadcast((q_ids, q_codes, mn, span))
    top_k = TOP_K

    def local_topk(batches):
        import pyarrow as pa

        qids, qcodes, bmn, bspan = b_q.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            idx = batch.schema.get_field_index
            n_ids = batch.column(idx("vec_id")).to_numpy().astype(np.int64)
            n_labels = batch.column(idx("label")).to_numpy().astype(np.int64)
            flat = batch.column(idx("embedding")).flatten().to_numpy(zero_copy_only=False)
            e = flat.astype(np.float64).reshape(batch.num_rows, -1)
            e *= 1024.0
            m = (np.sign(e) * np.floor(np.abs(e) + 0.5)).astype(np.int64)
            codes = (m - bmn) * 255 // bspan
            # |qv| ≤ 2^13, code·span ≤ 255·2^14 < 2^22 → 64-term dot < 2^41
            score = qcodes @ (codes * bspan).T  # exact int64
            cols = {k: [] for k in ("query_id", "neighbor_id", "neighbor_label", "qscore")}
            for qi in range(len(qids)):
                cand = np.nonzero(n_ids != qids[qi])[0]
                row = score[qi]
                if len(cand) > top_k:
                    cand = cand[np.lexsort((n_ids[cand], -row[cand]))[:top_k]]
                cols["query_id"].append(np.full(len(cand), qids[qi], dtype=np.int64))
                cols["neighbor_id"].append(n_ids[cand])
                cols["neighbor_label"].append(n_labels[cand])
                cols["qscore"].append(row[cand])
            if cols["query_id"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.concatenate(v)) for v in cols.values()],
                    names=list(cols.keys()),
                )

    scored = raw.mapInArrow(
        local_topk, schema="query_id long, neighbor_id long, neighbor_label long, qscore long"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("qscore"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOP_K)


N_TABLES = 4


def _table_planes(t: int) -> list[list[int]]:
    """Independent hyperplane set per table, md5-derived like PLANES."""
    return [
        [_plane_weight(t * 1000 + p, d) for d in range(DIM)]
        for p in range(N_PLANES)
    ]


TABLE_PLANES = [_table_planes(t) for t in range(N_TABLES)]


def _oracle_table_bucket(t: int) -> str:
    terms = []
    for p, w in enumerate(TABLE_PLANES[t]):
        arr = ", ".join(str(x) for x in w)
        dot = f"list_dot_product(qv, [{arr}]::BIGINT[])"
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


@query(
    "s_knn_lsh_multitable",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, {_ORACLE_QVEC} AS qv FROM embeddings WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0
    ), n AS (
      SELECT vec_id, label, qv, list_dot_product(qv, qv) AS nrm FROM q
    ), buckets AS (
      {" UNION ALL ".join(
          f"SELECT vec_id, {t} AS tbl, {_oracle_table_bucket(t)} AS bucket FROM q"
          for t in range(N_TABLES)
      )}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
      FROM buckets a
      JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket
                     AND b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    ), scored AS (
      SELECT c.query_id, c.neighbor_id, nb.label AS neighbor_label,
             CAST(list_dot_product(nq.qv, nb.qv) AS DOUBLE)
               / (sqrt(nq.nrm) * sqrt(nb.nrm)) AS cosine
      FROM cand c
      JOIN n nq ON nq.vec_id = c.query_id
      JOIN n nb ON nb.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine, rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t
    WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "knn", "lsh", "multitable"),
)
def s_knn_lsh_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table SRP-LSH — the recall knob turned: {N_TABLES}
    independent 8-plane tables, a candidate is any pair sharing a
    bucket in ANY table (union), then exact cosine ranks the deduped
    candidate set. tests/test_ann_recall.py measures the single-table
    variant at 0.41 recall on tight near-dup clusters; the union of
    {N_TABLES} independent tables recovers most of what any one table
    splits (P[all tables split a pair] ≈ 0.59^{N_TABLES}).

    Scale shape (r6 — the s_knn_bruteforce single-pass shape): the
    queries' {N_TABLES} bucket ids are computed driver-side from a
    pushed-filter collect (vec_id < nq reaches the parquet scan) and
    broadcast; ONE Arrow pass then computes every corpus vector's
    {N_TABLES} buckets with a single (N×64)@(64×{N_TABLES}·8) matmul,
    masks each query's candidates to bucket-collision-in-ANY-table
    (the multi-table union, evaluated as a vectorized compare — no
    row inflation, no join, no distinct: a (query, neighbor) pair
    either collides somewhere or it doesn't), scores survivors with
    the exact integer cosine, and keeps a local top-k. The only
    shuffle is the k·batches survivors into the final rank window —
    the r5 shape's 4×-row bucket materialization, broadcast join,
    and pair-distinct exchange are gone.
    """
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    raw = emb.filter(F.expr(FINITE_EMB)).select("vec_id", "label", "embedding")
    planes = np.array(
        [w for t in range(N_TABLES) for w in TABLE_PLANES[t]], dtype=np.float64
    )  # (N_TABLES*8, 64)
    bits = np.array([1 << p for p in range(N_PLANES)], dtype=np.int64)
    out_schema = (
        "query_id long, neighbor_id long, neighbor_label long, cosine double"
    )

    def _buckets(m: "np.ndarray") -> "np.ndarray":
        """(N, N_TABLES) int64 bucket ids from quantized vectors."""
        sig = (m @ planes.T) > 0  # (N, N_TABLES*8)
        return np.stack(
            [sig[:, t * N_PLANES : (t + 1) * N_PLANES] @ bits for t in range(N_TABLES)],
            axis=1,
        )

    qrows = raw.filter(F.col("vec_id") < N_QUERIES).collect()
    if not qrows:
        return spark.createDataFrame([], out_schema + ", rank int")
    qrows.sort(key=lambda r: r["vec_id"])
    e = np.array([r["embedding"] for r in qrows], dtype=np.float64) * 1024.0
    q_mat = np.sign(e) * np.floor(np.abs(e) + 0.5)  # == round() HALF_UP
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_nrm = (q_mat * q_mat).sum(axis=1)
    q_buckets = _buckets(q_mat)  # (nq, N_TABLES)
    b_q = spark.sparkContext.broadcast((q_ids, q_mat, q_nrm, q_buckets))
    top_k = TOP_K

    def local_topk(batches):
        import pyarrow as pa

        qids, qmat, qnrm, qbkt = b_q.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            idx = batch.schema.get_field_index
            n_ids = batch.column(idx("vec_id")).to_numpy().astype(np.int64)
            n_labels = batch.column(idx("label")).to_numpy().astype(np.int64)
            flat = batch.column(idx("embedding")).flatten().to_numpy(zero_copy_only=False)
            e = flat.astype(np.float64).reshape(batch.num_rows, -1)
            e *= 1024.0
            m = np.sign(e) * np.floor(np.abs(e) + 0.5)
            nrm = np.einsum("ij,ij->i", m, m)
            bkt = _buckets(m)  # (N, N_TABLES)
            cos = (qmat @ m.T) / (np.sqrt(qnrm)[:, None] * np.sqrt(nrm)[None, :])
            cols = {k: [] for k in ("query_id", "neighbor_id", "neighbor_label", "cosine")}
            for qi in range(len(qids)):
                # union over tables: collide in ANY table = candidate
                mask = (bkt == qbkt[qi][None, :]).any(axis=1) & (n_ids != qids[qi])
                cand = np.nonzero(mask)[0]
                row = cos[qi]
                if len(cand) > top_k:
                    cand = cand[np.lexsort((n_ids[cand], -row[cand]))[:top_k]]
                cols["query_id"].append(np.full(len(cand), qids[qi], dtype=np.int64))
                cols["neighbor_id"].append(n_ids[cand])
                cols["neighbor_label"].append(n_labels[cand])
                cols["cosine"].append(row[cand])
            if cols["query_id"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.concatenate(v)) for v in cols.values()],
                    names=list(cols.keys()),
                )

    scored = spread(raw).mapInArrow(local_topk, schema=out_schema)
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOP_K)

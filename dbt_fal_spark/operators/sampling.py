"""Dataset curation operators: deterministic sampling + sequence packing.

Training-data pipeline surface (build brief extensions beyond the
reference, which has no relational operators at all — SURVEY §1.1):

- ``t_stratified_sample``: per-stratum downsampling by a STABLE content
  hash, the way web-scale corpora rebalance languages/sources — the
  keep/drop decision is a pure function of the row, so it is
  reproducible across runs, engines, and cluster sizes, and needs no
  shuffle (map-only scan; the sampled subset streams straight into the
  next stage).
- ``t_pack_sequences``: greedy first-fit packing of documents into
  fixed token-budget bins (LLM context-window packing). Packing is
  inherently sequential per bin-stream, so the corpus shards by a hash
  of doc_id and each shard packs independently — parallelism is the
  shard count, state per shard is one (bin, fill) pair. At 100 TB you
  raise N_SHARDS to the write parallelism you want; the shuffle moves
  only (doc_id, n_tokens), never text.

Determinism anchors: the sample hash is the first 4 md5 bytes of the
doc_id string (same construction the MinHash family uses, exact in both
engines); token counts reuse t_token_stats' whitespace-split parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_fal_spark.registry import query
from dbt_fal_spark.sources.readers import load_table

# per-language keep-rate in percent: downsample the overrepresented
# stratum hard, keep the tail languages denser (corpus rebalancing)
SAMPLE_PCT = {"en": 10}
SAMPLE_PCT_DEFAULT = 40

N_SHARDS = 8
TOKEN_BUDGET = 512  # tokens per packed bin (context window)


def _oracle_pct_case() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in sorted(SAMPLE_PCT.items())
    )
    return f"CASE {whens} ELSE {SAMPLE_PCT_DEFAULT} END"


@query(
    "t_stratified_sample",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, source,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, lang, source, bucket
    FROM h
    WHERE bucket < {_oracle_pct_case()}
    """,
    tags=("sampling", "curation"),
)
def t_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: keep a doc iff
    md5(doc_id) % 100 < pct(lang). Content-hash gating (not rand()) is
    what makes the sample reproducible and incrementally stable — a doc's
    fate never changes as the corpus grows, so reprocessing only touches
    new docs. Map-only: the filter runs in the scan stage, no shuffle,
    and Catalyst prunes text entirely (the hash keys on doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    pct = F.lit(SAMPLE_PCT_DEFAULT)
    for lang, p in sorted(SAMPLE_PCT.items()):
        pct = F.when(F.col("lang") == lang, p).otherwise(pct)
    return (
        docs.select("doc_id", "lang", "source", bucket.alias("bucket"))
        .filter(F.col("bucket") < pct)
    )


def _greedy_pack_fn(budget: int):
    """Factory for the per-shard greedy fold. Returned closure is pickled
    BY VALUE (not module reference), so executors need no package import."""

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        bins, fill, b = [], 0, 0
        first = True
        for n in pdf["n_tokens"]:
            if not first and fill + n > budget:
                b += 1
                fill = n
            else:
                fill += n
                first = False
            bins.append(b)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "shard": pdf["shard"],
                "bin_id": pd.Series(bins, dtype="int64"),
                "n_tokens": pdf["n_tokens"],
            }
        )

    return pack


_PACK_CTE = f"""toks AS (
      SELECT doc_id, doc_id % {N_SHARDS} AS shard,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    ord AS (
      SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM toks
    ),
    pack(shard, rn, doc_id, n_tokens, bin_id, fill) AS (
      SELECT shard, rn, doc_id, n_tokens, 0, n_tokens FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
             CASE WHEN p.fill + o.n_tokens > {TOKEN_BUDGET}
                  THEN p.bin_id + 1 ELSE p.bin_id END,
             CASE WHEN p.fill + o.n_tokens > {TOKEN_BUDGET}
                  THEN o.n_tokens ELSE p.fill + o.n_tokens END
      FROM pack p JOIN ord o ON o.shard = p.shard AND o.rn = p.rn + 1
    )"""


@query(
    "t_pack_sequences",
    oracle=f"""
    WITH RECURSIVE {_PACK_CTE}
    SELECT doc_id, shard, bin_id, n_tokens FROM pack
    """,
    tags=("packing", "curation"),
)
def t_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy context-window packing: within each shard (doc_id mod
    N_SHARDS), walk docs in doc_id order and open a new bin whenever the
    running token fill would exceed TOKEN_BUDGET (an oversized doc gets a
    bin of its own). The sequential fold runs per shard in one
    applyInPandas group — the only shuffle carries (doc_id, n_tokens),
    two longs per doc, never the text; the oracle restates the same fold
    as a recursive CTE, so the bin assignment is engine-exact including
    the oversize edge case."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    return toks.groupBy("shard").applyInPandas(
        _greedy_pack_fn(TOKEN_BUDGET),
        schema="doc_id long, shard long, bin_id long, n_tokens int",
    )


@query(
    "t_pack_emit",
    oracle=f"""
    WITH RECURSIVE {_PACK_CTE}
    SELECT p.shard AS shard, p.bin_id AS bin_id,
           count(*) AS n_docs,
           CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
           string_agg(d.text, chr(30) ORDER BY p.doc_id) AS packed_text
    FROM pack p JOIN documents d ON d.doc_id = p.doc_id
    GROUP BY p.shard, p.bin_id
    """,
    tags=("packing", "curation"),
)
def t_pack_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shard-writer half of packing: join the bin assignment back to
    the text and emit one row per (shard, bin) with the member docs
    concatenated in doc_id order (record-separator \\x1e) — the training
    shard a sequence-packing pipeline actually writes. Text moves exactly
    once (the join shuffles it to its bin); the assignment side carries
    two longs per doc. At 100 TB the GROUP BY concat becomes the
    per-bin write task of a binary shard writer — same plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    assigned = toks.groupBy("shard").applyInPandas(
        _greedy_pack_fn(TOKEN_BUDGET),
        schema="doc_id long, shard long, bin_id long, n_tokens int",
    )
    joined = assigned.join(docs.select("doc_id", "text"), "doc_id")
    return joined.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.array_join(F.expr("transform(sort_array(collect_list(struct(doc_id, text))), x -> x.text)"), "\x1e").alias("packed_text"),
    ).select("shard", "bin_id", "n_docs", "n_tokens", "packed_text")


# Target mixture weights per source domain (relative shares; sources not
# listed get DEFAULT). Over-represented domains get down-sampled toward
# their target share; under-represented ones are kept whole (no
# upsampling — keep_pct caps at 100).
MIX_WEIGHTS = {"src0": 5, "src1": 3}
MIX_WEIGHT_DEFAULT = 1


def _oracle_weight_case() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in sorted(MIX_WEIGHTS.items())
    )
    return f"CASE {whens} ELSE {MIX_WEIGHT_DEFAULT} END"


@query(
    "t_domain_mix_sample",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST({_oracle_weight_case()} AS BIGINT) AS w
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS total_n, CAST(sum(w) AS BIGINT) AS total_w
      FROM counts
    ), probs AS (
      SELECT source, n, w,
             least(100, (100 * w * total_n) // (total_w * n)) AS keep_pct
      FROM counts, tot
    )
    SELECT d.doc_id, d.source, p.keep_pct
    FROM documents d JOIN probs p USING (source)
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 100 < p.keep_pct
    """,
    tags=("sampling", "mixing"),
)
def t_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture resampling: re-weight source domains toward target
    mixture shares (the Pile/RedPajama-style mixing step). Unlike
    t_stratified_sample's FIXED rates, the keep probability here is
    DERIVED from the data — target share w_s/Σw vs observed share
    n_s/N — so the same spec rebalances any corpus.

    Plan: one per-source count (map-side combined, source-keyed — at
    most |domains| groups), a scalar total, and the per-source keep_pct
    table broadcasts back onto the corpus scan; the gate itself is the
    same stable md5 bucket as t_stratified_sample, so the decision is a
    pure row function — reproducible across runs, engines and cluster
    sizes. All probability math is integer (×100 scaling + floor
    division on BIGINTs), exact in both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    w_col = F.lit(MIX_WEIGHT_DEFAULT)
    for s, w in sorted(MIX_WEIGHTS.items()):
        w_col = F.when(F.col("source") == s, w).otherwise(w_col)
    counts = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
    ).withColumn("w", w_col.cast("bigint"))
    tot = counts.agg(
        F.sum("n").cast("bigint").alias("total_n"),
        F.sum("w").cast("bigint").alias("total_w"),
    )
    probs = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "keep_pct",
            F.least(
                F.lit(100),
                F.expr("(100 * w * total_n) div (total_w * n)"),
            ),
        )
        .select("source", "keep_pct")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    return (
        docs.join(F.broadcast(probs), "source")
        .filter(bucket < F.col("keep_pct"))
        .select("doc_id", "source", "keep_pct")
    )

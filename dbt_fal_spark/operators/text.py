"""Text-analysis operators over the ``documents`` table.

Training-data pipeline surface (build brief): token counting, quality
scoring, language ID, document fingerprinting. The reference's only text
processing is whole-table pandas/HF-pipeline scripts (reference:
projects/adapter/examples/sentiment-analysis/README.md); here each
operator is a columnar Spark expression — JVM-side, no Python in the
hot path — so it runs at scan speed on 100 TB.

All token logic splits on single spaces (the corpus is normalized);
`array`/`lambda` higher-order functions keep everything inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_fal_spark.registry import query
from dbt_fal_spark.sources.readers import load_table

# Stopword markers per language for the naive lang-ID scorer. Determinism,
# not accuracy, is the contract (the synthetic corpus shares one vocabulary).
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de", "le", "shi", "he", "zai"),
}
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _sql_in(words: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


@query(
    "t_token_stats",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_token_len
    FROM documents
    """,
    tags=("text",),
)
def t_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting — pure codegen'd array expressions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / F.size(toks)).alias(
            "avg_token_len"
        ),
    )


@query(
    "t_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT doc_id,
           n_tokens,
           CAST(len(list_filter(toks, x -> x IN {_sql_in(STOPWORDS)})) AS DOUBLE)
             / n_tokens AS stopword_ratio,
           CAST(len(list_distinct(toks)) AS DOUBLE) / n_tokens AS lexical_diversity,
           0.4 * (CAST(len(list_filter(toks, x -> x IN {_sql_in(STOPWORDS)})) AS DOUBLE) / n_tokens)
             + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / n_tokens)
             + 0.3 * (CAST(least(n_tokens, 200) AS DOUBLE) / 200) AS quality_score
    FROM t
    """,
    tags=("text", "quality"),
)
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: stopword ratio + lexical diversity +
    length saturation, weighted. The standard cheap pre-filter before
    expensive dedup/model scoring in a training-data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    stop_in = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.size(F.expr(f"filter(split(text, ' '), x -> x IN ({stop_in}))"))
    stop_ratio = n_stop.cast("double") / n_tokens
    diversity = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    length_sat = F.least(n_tokens, F.lit(200)).cast("double") / 200
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        diversity.alias("lexical_diversity"),
        (0.4 * stop_ratio + 0.3 * diversity + 0.3 * length_sat).alias("quality_score"),
    )


@query(
    "t_langid_naive",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             {", ".join(f"len(list_filter(toks, x -> x IN {_sql_in(m)})) AS {lg}_hits" for lg, m in sorted(LANG_MARKERS.items()))}
      FROM t
    )
    SELECT doc_id, lang,
           de_hits, en_hits, es_hits, fr_hits, zh_hits,
           CASE
             WHEN de_hits + en_hits + es_hits + fr_hits + zh_hits = 0 THEN 'unknown'
             WHEN de_hits >= en_hits AND de_hits >= es_hits AND de_hits >= fr_hits AND de_hits >= zh_hits THEN 'de'
             WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= zh_hits THEN 'en'
             WHEN es_hits >= fr_hits AND es_hits >= zh_hits THEN 'es'
             WHEN fr_hits >= zh_hits THEN 'fr'
             ELSE 'zh'
           END AS predicted_lang
    FROM scored
    """,
    tags=("text", "langid"),
)
def t_langid_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID with a deterministic alphabetical
    tie-break. Swap LANG_MARKERS for real per-language stopword lists in
    production; the plan shape (pure column expressions) is the point."""
    docs = load_table(spark, sf_dir, "documents")
    cols = [F.col("doc_id"), F.col("lang")]
    hit_cols = {}
    for lg, markers in sorted(LANG_MARKERS.items()):
        mk = ", ".join(f"'{w}'" for w in markers)
        hit_cols[lg] = F.size(F.expr(f"filter(split(text, ' '), x -> x IN ({mk}))"))
        cols.append(hit_cols[lg].alias(f"{lg}_hits"))
    total = None
    for c in hit_cols.values():
        total = c if total is None else total + c
    langs = sorted(LANG_MARKERS)
    pred = F.when(total == 0, "unknown")
    for i, lg in enumerate(langs):
        cond = None
        for other in langs[i + 1 :]:
            c = hit_cols[lg] >= hit_cols[other]
            cond = c if cond is None else cond & c
        pred = pred.when(cond if cond is not None else F.lit(True), lg)
    cols.append(pred.alias("predicted_lang"))
    return docs.select(*cols)


@query(
    "t_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS fp_md5,
           ('0x' || substr(md5(text), 1, 8))::BIGINT % 1024 AS fp_bucket,
           md5(lower(replace(text, ' ', ''))) AS fp_normalized
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of raw and normalized text + a shard
    bucket from the first 8 hex digits. The bucket column is the
    partitioning key a 100 TB dedup would co-locate duplicates on."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("fp_md5"),
        (F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 1024).alias("fp_bucket"),
        F.md5(F.lower(F.replace(F.col("text"), F.lit(" "), F.lit("")))).alias("fp_normalized"),
    )


@query(
    "t_lang_profile",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           sum(n_chars) AS total_chars,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
           count(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "aggregate"),
)
def t_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per language — the dashboard query over a crawl."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "t_top_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ), idx AS (
      SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i FROM toks
    ), bg AS (
      SELECT l[i] || ' ' || l[i + 1] AS bigram FROM idx
    )
    SELECT bigram, count(*) AS n
    FROM bg
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
    tags=("text", "ngram"),
)
def t_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams: shingle → explode → count → top-k.
    The explode multiplies rows ~token-count×, but the partial agg
    collapses them before the shuffle; top-k is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    # split ONCE per row, then pair adjacent tokens; inlining the split
    # into the lambda would re-tokenize the full text per bigram (O(len²))
    toks = docs.select(F.split("text", " ").alias("w"))
    bigrams = F.expr("transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))")
    return (
        toks.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@query(
    "t_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / (df.df + 1) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf, rnk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term
      ) AS rnk
      FROM scored
    ) t
    WHERE rnk <= 3
    """,
    tags=("text", "tfidf"),
)
def t_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc by a rational TF-IDF variant:
    score = tf·(N+1)/(df+1) (a monotone-in-1/df inverse-frequency weight).

    tf and df are integer aggregates (order-independent); tf·(N+1) stays
    in exact int64 and the score is ONE double division — no float sums
    and no transcendental calls, so both engines agree bit-for-bit (ln()
    differs between JVM and C libm in the last ulp, which is why the
    classic log-idf can't be hash-compared across engines). df rides a broadcast join back onto
    the per-doc term counts; ties break lexicographically so the top-3 is
    deterministic. The scale path drops terms with df ≈ N (stopwords)
    before the join — they can't reach any top-k.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            ((F.col("tf") * (F.col("n_docs") + 1)).cast("double") / (F.col("df") + 1)).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W

    wnd = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(wnd))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", "rnk")
    )

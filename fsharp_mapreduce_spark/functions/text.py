"""Text-analysis operators over the ``documents`` table (north-star
extensions, BASELINE.json): language-ID, quality scoring, token
counting, document fingerprinting.

Everything here is pure Catalyst expression work — array/lambda
higher-order functions, regexes, folds — no Python UDF in any hot
path, so the plans stay inside whole-stage codegen and scale linearly
with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fsharp_mapreduce_spark.registry import fan_out, register, scoped_persist, table

# Minimal per-language stopword lists. A deterministic heuristic, not a
# model: predicted language = argmax of distinct-stopword overlap, ties
# broken in the fixed order en > de > es > fr > zh.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "por", "que", "para"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "que", "dans"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, lowercased."""
    return F.split(F.lower(text), " ")


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _score(tokens: Column, lang: str) -> Column:
    lits = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(tokens, lits)).cast("bigint")


@register(
    "t05_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
        {", ".join(
            f"CAST(len(list_intersect(string_split(lower(text), ' '), {_sql_list(STOPWORDS[lang])})) AS BIGINT) AS s_{lang}"
            for lang in LANG_ORDER
        )}
      FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS predicted_lang,
           s_en, s_de, s_es, s_fr, s_zh
    FROM scored
    """,
    tags=("text", "langid"),
)
def t05_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword-overlap language ID: per-language distinct
    stopword hit counts + deterministic argmax. Expression-only
    (array_intersect over a literal array — broadcast-free, the
    stopword lists live in the plan)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = tokens_col(F.col("text"))
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[_score(toks, lang).alias(f"s_{lang}") for lang in LANG_ORDER],
    )
    s = {lang: F.col(f"s_{lang}") for lang in LANG_ORDER}
    predicted = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] >= s["zh"]), "de")
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), "es")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh")
    )
    return scored.select(
        "doc_id",
        "labeled_lang",
        predicted.alias("predicted_lang"),
        "s_en",
        "s_de",
        "s_es",
        "s_fr",
        "s_zh",
    )


@register(
    "t06_quality_score",
    oracle="""
    WITH per_doc AS (
      SELECT doc_id, source,
             CAST(length(text) AS BIGINT) AS n_chars_m,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[\\.,;:!?]')) AS BIGINT) AS n_punct,
             CAST(len(list_filter(string_split(lower(text), ' '),
                  x -> list_contains(['the','and','of','to','a','in','is','it','that','for'], x))) AS BIGINT) AS n_stop
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars_m), 6)  AS avg_chars,
           ROUND(AVG(n_tokens), 6)   AS avg_tokens,
           ROUND(AVG(n_punct  * 1.0 / n_chars_m), 6) AS punct_ratio,
           ROUND(AVG(n_stop   * 1.0 / n_tokens), 6)  AS stopword_ratio,
           ROUND(AVG(n_chars_m * 1.0 / n_tokens), 6) AS avg_token_len
    FROM per_doc
    GROUP BY source
    """,
    tags=("text", "quality"),
)
def t06_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-quality signals (length / punctuation / stopword
    ratios), aggregated per source — the standard pre-training corpus
    quality triage, as pure column expressions."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = tokens_col(F.col("text"))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    per_doc = docs.select(
        "doc_id",
        "source",
        F.length("text").cast("bigint").alias("n_chars_m"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[\.,;:!?]"), 0))
        .cast("bigint")
        .alias("n_punct"),
        F.size(F.filter(toks, lambda x: F.array_contains(en_stop, x)))
        .cast("bigint")
        .alias("n_stop"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars_m"), 6).alias("avg_chars"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.round(F.avg(F.col("n_punct") / F.col("n_chars_m")), 6).alias("punct_ratio"),
        F.round(F.avg(F.col("n_stop") / F.col("n_tokens")), 6).alias("stopword_ratio"),
        F.round(F.avg(F.col("n_chars_m") / F.col("n_tokens")), 6).alias("avg_token_len"),
    )


@register(
    "t07_token_count",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS total_tokens,
           ROUND(AVG(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]'))), 6) AS avg_tokens
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "tokens"),
)
def t07_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: alphanumeric runs plus individual
    non-space symbols (the pre-tokenizer split every BPE vocabulary
    starts from), counted per language."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    n_tok = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+|[^a-z0-9 ]"), 0)
    )
    return (
        docs.withColumn("n_tok", n_tok)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_tok"), 6).alias("avg_tokens"),
        )
    )


@register(
    "t08_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 list_filter(string_split(text, ''), x -> x <> ''),
                 x -> CAST(ascii(x) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007
           ) AS fingerprint
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def t08_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint
    (h = fold(h*31 + codepoint mod 1e9+7)) as an expression fold —
    deterministic, order-sensitive, cross-engine reproducible (unlike
    xxhash64, which only Spark has)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    chars = F.filter(F.split("text", ""), lambda x: x != F.lit(""))
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + F.ascii(x)) % 1000000007,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@register(
    "t16_token_chunking",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    c AS (
      SELECT doc_id,
             [ list_aggregate(ws[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_TOKENS}], 'string_agg', ' ')
               for i in generate_series(0,
                 CASE WHEN len(ws) <= {CHUNK_TOKENS} THEN 0
                      ELSE CAST(ceil((len(ws) - {CHUNK_TOKENS}) * 1.0 / {CHUNK_STRIDE}) AS BIGINT) END) ] AS chunks
      FROM w
    )
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS chunk_idx,
           chunks[i] AS chunk_text,
           CAST(len(string_split(chunks[i], ' ')) AS BIGINT) AS n_tokens
    FROM (
      SELECT doc_id, chunks,
             unnest(generate_series(1, len(chunks))) AS i
      FROM c
    )
    """,
    tags=("text", "chunking"),
)
def t16_token_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token-window chunking — the retrieval/context-window
    prep step every LLM data pipeline runs: {64}-token chunks with a
    {48}-token stride (16-token overlap), one output row per chunk
    with its index and token count. The last chunk starts at the final
    stride position that still adds new tokens, so every token lands
    in ≥1 chunk and no empty chunks are emitted.

    Pure expression work (sequence + slice + array_join + posexplode):
    zero Python, zero shuffle — a Generate over the scan projection,
    linear in corpus bytes at 100 TB. Chunk rows carry text, so the
    output is ~1.33× input bytes (the overlap tax), which is the
    expected shape for a chunker feeding an embedding stage."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    tokd = docs.select("doc_id", F.split(F.lower(F.col("text")), " ").alias("toks"))
    n = F.size("toks")
    # number of chunks - 1: ceil((n - CH) / stride), clamped at 0
    last_idx = F.when(
        n <= CHUNK_TOKENS, F.lit(0)
    ).otherwise(F.ceil((n - CHUNK_TOKENS) / F.lit(CHUNK_STRIDE)).cast("int"))
    chunks = F.transform(
        F.sequence(F.lit(0), last_idx),
        lambda i: F.array_join(
            F.slice("toks", i * CHUNK_STRIDE + 1, CHUNK_TOKENS), " "
        ),
    )
    chunked = tokd.select("doc_id", chunks.alias("chunks"))
    return chunked.select(
        "doc_id", F.posexplode("chunks").alias("chunk_idx", "chunk_text")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "chunk_text",
        F.size(F.split("chunk_text", " ")).cast("bigint").alias("n_tokens"),
    )


PMI_TOP_N = 100


@register(
    "t17_bigram_pmi",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    bg AS (
      SELECT unnest(CASE WHEN len(ws) >= 2 THEN
               [struct_pack(a := ws[i], b := ws[i+1])
                for i in generate_series(1, len(ws) - 1)]
             ELSE [] END) AS p
      FROM w
    ),
    pairs AS (SELECT p.a AS a, p.b AS b, COUNT(*) AS c_ab FROM bg GROUP BY 1, 2),
    toks AS (
      SELECT t AS tok, COUNT(*) AS c FROM (SELECT unnest(ws) AS t FROM w)
      GROUP BY 1
    ),
    n AS (SELECT SUM(c) AS total FROM toks),
    scored AS (
      SELECT pairs.a, pairs.b, pairs.c_ab,
             ROUND(ln(pairs.c_ab * n.total * 1.0 / (ta.c * tb.c)), 6) AS pmi
      FROM pairs
      JOIN toks ta ON pairs.a = ta.tok
      JOIN toks tb ON pairs.b = tb.tok
      CROSS JOIN n
    )
    SELECT a, b, c_ab, pmi FROM scored
    ORDER BY c_ab DESC, a, b LIMIT {PMI_TOP_N}
    """,
    tags=("text", "ngram", "pmi"),
)
def t17_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram statistics with pointwise mutual information —
    the n-gram language-model profile (collocation strength) a
    training pipeline computes before filtering/weighting data. One
    Generate for bigrams, hash aggregates for pair and unigram counts,
    two broadcast-able joins against the unigram table, a scalar total
    — every exchange keyed on token strings with map-side combine; the
    top-N is TakeOrderedAndProject. PMI = ln(c_ab·N / (c_a·c_b)),
    rounded at 6 dp (both engines evaluate libm ln on identical
    doubles)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    # persist the tokenized projection: the bigram AND unigram
    # aggregates both consume it, and Catalyst re-expands shared
    # subtrees, so without the cache the scan+lowercase+split pipeline
    # runs once per consumer (measured 2.1s → 1.2s at sf0.1). At real
    # scale this cache is the tokenized staging table a pipeline
    # materializes once and reuses.
    tokd = scoped_persist(docs.select(F.split(F.lower(F.col("text")), " ").alias("ws")))
    bigrams = F.when(
        F.size("ws") >= 2,
        F.expr("transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS a, ws[i] AS b))"),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    bg = tokd.select(F.explode(bigrams).alias("p")).select("p.a", "p.b")
    pairs = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    # persist the unigram table too — it feeds the total, both join
    # sides (ta/tb), and is vocabulary-sized, so the cache is tiny and
    # AQE broadcasts it into the pair joins.
    toks = scoped_persist(
        tokd.select(F.explode("ws").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = toks.agg(F.sum("c").alias("total"))
    ta = toks.select(F.col("tok").alias("a"), F.col("c").alias("ca"))
    tb = toks.select(F.col("tok").alias("b"), F.col("c").alias("cb"))
    scored = (
        pairs.join(ta, "a")
        .join(tb, "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            "c_ab",
            F.round(
                F.log(F.col("c_ab") * F.col("total") / (F.col("ca") * F.col("cb"))), 6
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("c_ab").desc(), "a", "b").limit(PMI_TOP_N)


CLEAN_MIN_TOKEN_LEN = 2
CLEAN_MIN_TOKENS = 5


@register(
    "t18_clean_text",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '),
                         t -> len(t) >= {CLEAN_MIN_TOKEN_LEN}
                              AND NOT list_contains({_sql_list(STOPWORDS["en"])}, t))
               AS kept
      FROM documents
    )
    SELECT doc_id, lang,
           list_aggregate(kept, 'string_agg', ' ') AS clean_text,
           CAST(len(kept) AS BIGINT) AS n_tokens
    FROM w
    WHERE len(kept) >= {CLEAN_MIN_TOKENS}
    """,
    tags=("text", "cleaning"),
)
def t18_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text cleaning — the preprocessing step between raw corpus and
    tokenizer: lowercase, drop English stopwords and sub-{2}-char
    tokens, re-join, and drop documents left with fewer than {5}
    tokens (the empty-shell filter). Pure expression work (filter +
    array_join on the token array) — a map-only projection whose
    survivors stream straight into t16's chunker or t03's shingler at
    100 TB. The oracle replays the identical token predicate, so the
    cleaned TEXT ITSELF is value-hash-checked, not just counts."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    kept = clean_kept_tokens(F.split(F.lower(F.col("text")), " "))
    out = docs.select(
        "doc_id",
        "lang",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).cast("bigint").alias("n_tokens"),
    )
    return out.where(F.col("n_tokens") >= CLEAN_MIN_TOKENS)


TFIDF_TOP_K = 3


@register(
    "t19_tfidf_top_terms",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    tf AS (
      SELECT doc_id, t AS tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(ws) AS t FROM w) GROUP BY 1, 2
    ),
    dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
             ROUND(tf.tf * ln(n.n_docs * 1.0 / dfreq.df), 6) AS tfidf
      FROM tf JOIN dfreq USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tf, df, tfidf, rk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, tok
      ) AS BIGINT) AS rk FROM scored
    ) WHERE rk <= {TFIDF_TOP_K}
    """,
    tags=("text", "tfidf"),
)
def t19_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction — the corpus-statistics
    twin of t17 (pytest-only family member; t17 holds the gate slot).
    A training pipeline uses the top-weighted terms for topic
    bucketing and near-duplicate triage before expensive dedup.

    Plan shape at 100 TB: one Generate (explode) feeding a hash
    aggregate keyed on (doc_id, tok) with map-side combine; the
    document-frequency table is a second vocabulary-sized aggregate
    that AQE broadcasts back into the join; the scalar corpus count
    is a broadcast crossJoin; the final top-{3} is a bounded
    per-doc-key window (rank data = vocabulary of one doc). Ranking
    happens on the ROUNDED score so Spark and DuckDB break float ties
    identically (tiebreak: token string)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    )
    # persist the term-frequency table: it feeds the document-frequency
    # aggregate AND the scoring join, and Catalyst re-expands shared
    # subtrees — without the cache the scan+explode+hash-agg pipeline
    # runs once per consumer (t17's pattern; at scale this is the
    # doc-term staging table a pipeline materializes once).
    tf = scoped_persist(
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    )
    return (
        scored.withColumn("rk", rk.cast("bigint"))
        .where(F.col("rk") <= TFIDF_TOP_K)
        .select("doc_id", "tok", "tf", "df", "tfidf", "rk")
    )


# Gopher-style repetition thresholds (Rae et al. 2021, table A1 spirit:
# excessive duplicate lines/n-grams mark low-quality documents).
REP_MAX_DUP_TOKEN_RATIO = 0.30
REP_MAX_DUP_BIGRAM_RATIO = 0.20


def clean_kept_tokens(ws: Column) -> Column:
    """t18's cleaning rule as a reusable expression: the tokens that
    survive (length >= CLEAN_MIN_TOKEN_LEN, not an English stopword).
    Shared by t18 (emits the kept text), t28 and st12 (use the count
    as a keep-flag) so the rule has exactly one definition."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    return F.filter(
        ws, lambda t: (F.length(t) >= CLEAN_MIN_TOKEN_LEN) & ~F.array_contains(stop, t)
    )


def clean_keep_col(ws: Column) -> Column:
    """Boolean: does the document survive t18's empty-shell filter?"""
    return F.size(clean_kept_tokens(ws)) >= CLEAN_MIN_TOKENS


def bigram_strings_col(ws_name: str) -> Column:
    """Adjacent-token bigram strings of an array column (BY NAME - the
    transform lambda references the materialized column attribute).
    Spark's sequence(1, n) is DESCENDING for n < 1, so the short-doc
    case is guarded (t17's idiom). Shared by t20/t28/st12."""
    return F.when(
        F.size(ws_name) >= 2,
        F.expr(
            f"transform(sequence(1, size({ws_name}) - 1), "
            f"i -> concat({ws_name}[i-1], ' ', {ws_name}[i]))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_keep_col(ws_name: str, bg_name: str) -> Column:
    """Boolean: does the document pass t20's Gopher repetition rules?
    (6-dp-rounded exact-int ratios, the cross-engine convention.)
    Shared by t20's keep column, t28 and st12."""
    tok_ok = (
        F.round(1.0 - F.size(F.array_distinct(ws_name)) / F.size(ws_name), 6)
        <= REP_MAX_DUP_TOKEN_RATIO
    )
    bg_ok = F.when(F.size(bg_name) == 0, F.lit(True)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(bg_name)) / F.size(bg_name), 6)
        <= REP_MAX_DUP_BIGRAM_RATIO
    )
    return tok_ok & bg_ok



@register(
    "t20_repetition_filter",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    b AS (
      SELECT doc_id, ws,
             CASE WHEN len(ws) >= 2 THEN
               [ws[i] || ' ' || ws[i+1] for i in generate_series(1, len(ws) - 1)]
             ELSE [] END AS bg
      FROM w
    ),
    r AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_tokens,
             ROUND(1.0 - len(list_distinct(ws)) * 1.0 / len(ws), 6)
               AS dup_token_ratio,
             CASE WHEN len(bg) = 0 THEN 0.0
                  ELSE ROUND(1.0 - len(list_distinct(bg)) * 1.0 / len(bg), 6)
             END AS dup_bigram_ratio
      FROM b
    )
    SELECT doc_id, n_tokens, dup_token_ratio, dup_bigram_ratio,
           (dup_token_ratio <= {REP_MAX_DUP_TOKEN_RATIO}
            AND dup_bigram_ratio <= {REP_MAX_DUP_BIGRAM_RATIO}) AS keep
    FROM r
    """,
    tags=("text", "quality", "repetition"),
)
def t20_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (the Gopher rule family) — the
    quality-scoring twin of t06 (pytest-only family member; t06 holds
    the gate slot). Flags documents whose duplicate-token or
    duplicate-bigram fraction exceeds the thresholds: boilerplate,
    keyword-stuffing, and generation loops all light up here while
    t06's length/punctuation ratios stay normal.

    Map-only: both ratios are array expressions (array_distinct /
    size) over the token split — zero exchanges, scales with input
    splits. The single-token edge (no bigrams) is pinned to ratio 0
    on both engines; ratios are exact-int divisions rounded at 6 dp,
    so the boolean `keep` threshold compares identically."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    ws = F.split(F.lower(F.col("text")), " ")
    bg = bigram_strings_col("ws")
    withcols = (
        docs.select("doc_id", ws.alias("ws"))
        .withColumn("bg", bg)
        .select(
            "doc_id",
            F.size("ws").cast("bigint").alias("n_tokens"),
            F.round(
                1.0 - F.size(F.array_distinct("ws")) / F.size("ws"), 6
            ).alias("dup_token_ratio"),
            F.when(F.size("bg") == 0, F.lit(0.0))
            .otherwise(
                F.round(1.0 - F.size(F.array_distinct("bg")) / F.size("bg"), 6)
            )
            .alias("dup_bigram_ratio"),
        )
    )
    return withcols.withColumn(
        "keep",
        (F.col("dup_token_ratio") <= REP_MAX_DUP_TOKEN_RATIO)
        & (F.col("dup_bigram_ratio") <= REP_MAX_DUP_BIGRAM_RATIO),
    )


@register(
    "t21_bigram_lm_score",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    db AS (
      SELECT doc_id, unnest(CASE WHEN len(ws) >= 2 THEN
               [struct_pack(a := ws[i], b := ws[i+1])
                for i in generate_series(1, len(ws) - 1)]
             ELSE [] END) AS p
      FROM w
    ),
    flat AS (SELECT doc_id, p.a AS a, p.b AS b FROM db),
    pairs AS (SELECT a, b, COUNT(*) AS c_ab FROM flat GROUP BY 1, 2),
    starts AS (SELECT a, SUM(c_ab) AS c_a FROM pairs GROUP BY 1),
    scored AS (
      SELECT flat.doc_id, ln(pairs.c_ab * 1.0 / starts.c_a) AS lp
      FROM flat JOIN pairs USING (a, b) JOIN starts USING (a)
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(lp), 6) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    tags=("text", "ngram", "lm-score"),
)
def t21_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM document scoring — the perplexity-filter shape
    (pytest-only family member; t17 holds the n-gram-stats gate slot):
    fit a bigram model on the corpus itself (P(b|a) = c_ab / Σ_x c_ax,
    exact counts, no smoothing needed since every scored bigram is in
    the fit set by construction) and score each document by its mean
    bigram log-probability. Low scores mark documents whose word
    transitions are unlike the corpus — gibberish, boilerplate, wrong
    language — the third quality lens next to t06 (surface ratios) and
    t20 (repetition).

    Plan: one Generate for (doc_id, a, b); the pair and start counts
    are vocabulary-sized hash aggregates that AQE broadcasts back into
    the scoring joins; the per-doc mean is a final keyed aggregate.
    Docs with <2 tokens have no bigrams and drop out (same convention
    as the oracle's inner joins)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    ws = F.split(F.lower(F.col("text")), " ")
    bigrams = F.when(
        F.size("ws") >= 2,
        F.expr("transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS a, ws[i] AS b))"),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    # persist the per-doc bigram stream: it feeds the pair-count fit
    # AND the scoring join (Catalyst re-expands shared subtrees).
    flat = scoped_persist(
        docs.select("doc_id", ws.alias("ws"))
        .select("doc_id", F.explode(bigrams).alias("p"))
        .select("doc_id", "p.a", "p.b")
    )
    pairs = flat.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    starts = pairs.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    scored = (
        flat.join(pairs, ["a", "b"])
        .join(starts, "a")
        .select("doc_id", F.log(F.col("c_ab") / F.col("c_a")).alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


WINNOW_K = 8  # k-gram length (chars)
WINNOW_W = 16  # winnowing window (k-gram positions)
WINNOW_MOD = 1_000_000_007
WINNOW_CONTAINMENT = 0.5
# Hot-fingerprint cap (VERDICT r3 #2 — t02's STOP_SHINGLE_MAX_POSTINGS
# applied to winnowing): a fingerprint posted by more than this many
# documents is dropped from CANDIDATE GENERATION only. Winnowing
# fingerprints of boilerplate (headers, licenses, navigation chrome)
# are hot in any real corpus and would emit O(cap²) pairs per hot
# value — the classic 100 TB skew killer. Containment of every emitted
# pair stays EXACT: verification intersects the FULL fingerprint
# sketches; the only effect is that a pair connected solely through
# boilerplate fingerprints is not surfaced — the standard web-dedup
# trade. Inert on the fixture (max posting count ≪ 1024); the
# skew-corpus test pins the bounded-pairs behavior at a small cap.
WINNOW_MAX_POSTINGS = 1024


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fps: array<long>) — distinct winnowing fingerprints:
    {WINNOW_K}-gram polynomial rolling hashes (t08's 31/1e9+7 family,
    exact BIGINT mod arithmetic — cross-engine bit-identical), minimum
    per {WINNOW_W}-wide window, ≈ 2/(w+1) of positions survive — an 8×
    sketch compression.

    One vectorized Arrow pass (r11 optimization — the t48 gram-digest
    lesson applied to the last HOF hotspot): the expression
    formulation (`transform(sequence(...), aggregate(slice(...)))`,
    kept below as `_expression_winnow_fingerprints` and
    equality-pinned) runs on Catalyst's INTERPRETED path — one lambda
    eval per (gram position × k chars), O(chars × {WINNOW_K}) per
    document, the dominant cost of the t22 bench row. Here the
    rolling hashes are one numpy sliding-window dot per document
    (int64 — the dot is ≤ 0x10FFFF·Σⱼ31ʲ ≈ 3.2e16 < 2⁶³ for j <
    {WINNOW_K}, since codepoints reach 0x10FFFF, not 255 — ADVICE
    r11 corrected the stated bound; the margin to 2⁶³ is still ~280×,
    so the single-mod arithmetic is exact and bit-identical to the
    per-char fold), window minima one strided min, distinct one
    np.unique. Codepoints via utf-32-le == F.ascii per split char on
    every plane (pinned incl. astral-plane chars by
    test_winnow_vectorized_matches_expression). Embarrassingly
    parallel, no shuffle; integer semantics unchanged, DuckDB oracle
    untouched."""
    from fsharp_mapreduce_spark.session import ensure_package_shipped

    ensure_package_shipped(docs.sparkSession)

    def run(batches):
        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        w = np.array(
            [31 ** (WINNOW_K - 1 - j) for j in range(WINNOW_K)], dtype=np.int64
        )
        for pdf in batches:
            ids, out = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                cs = np.frombuffer(
                    (text or "").encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                if len(cs) < WINNOW_K:
                    ids.append(did)
                    out.append([])
                    continue
                hs = (sliding_window_view(cs, WINNOW_K) * w).sum(axis=1) % WINNOW_MOD
                if len(hs) < WINNOW_W:
                    fps = hs.min(keepdims=True)
                else:
                    fps = sliding_window_view(hs, WINNOW_W).min(axis=1)
                ids.append(did)
                out.append(np.unique(fps).tolist())
            yield pd.DataFrame({"doc_id": ids, "fps": out})

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, fps array<long>"
    )


def _expression_winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """The pure-Catalyst-expression formulation of the identical
    fingerprint set (the `_expression_simhash_signatures` pattern:
    kept as the differential twin — tests/test_dedup.py::
    test_winnow_vectorized_matches_expression pins vectorized ==
    expression semantics; fps ORDER may differ, the set may not)."""
    codes = F.transform(
        F.filter(F.split("text", ""), lambda x: x != F.lit("")),
        lambda x: F.ascii(x).cast("long"),
    )
    d = docs.select("doc_id", codes.alias("cs"))
    # k-gram rolling hashes; Spark's sequence(1, n) is DESCENDING for
    # n < 1, so the short-doc case must be guarded (t17's idiom)
    hs = F.when(
        F.size("cs") >= WINNOW_K,
        F.expr(
            f"transform(sequence(1, size(cs) - {WINNOW_K} + 1), "
            f"i -> aggregate(slice(cs, i, {WINNOW_K}), 0L, "
            f"(a, b) -> (a * 31 + b) % {WINNOW_MOD}))"
        ),
    ).otherwise(F.array().cast("array<long>"))
    fps_col = F.array_distinct(
        F.when(F.size("hs") == 0, F.array().cast("array<long>"))
        .when(F.size("hs") < WINNOW_W, F.array(F.array_min("hs")))
        .otherwise(
            F.expr(
                f"transform(sequence(1, size(hs) - {WINNOW_W} + 1), "
                f"j -> array_min(slice(hs, j, {WINNOW_W})))"
            )
        )
    )
    return d.withColumn("hs", hs).select("doc_id", fps_col.alias("fps"))


def winnow_candidate_pairs(fps: DataFrame, cap: int) -> DataFrame:
    """(doc_a, doc_b) distinct pairs sharing ≥1 non-hot fingerprint.
    Posting counts per fingerprint (one partial-aggregated exchange on
    8-byte keys), anti-join the hot set (tiny by construction →
    broadcast), self-equi-join the kept postings. Parameterized on the
    cap so the skew-corpus test can exercise a small one directly."""
    flat = fps.select("doc_id", F.explode("fps").alias("fp"))
    hot = (
        flat.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("pc"))
        .where(F.col("pc") > cap)
        .select("fp")
    )
    kept = flat.join(F.broadcast(hot), "fp", "left_anti")
    a = kept.select(F.col("doc_id").alias("doc_a"), "fp")
    b = kept.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def winnow_containment_pairs(
    docs: DataFrame, cap: int = WINNOW_MAX_POSTINGS
) -> DataFrame:
    """Containment pairs over winnowing sketches with a hot-fingerprint
    cap on candidate generation — t02's exact-count machinery: shared
    counts come from the codegen self-join+agg over NON-HOT postings,
    patched with the hot remainder computed from tiny per-doc
    hot-fingerprint arrays, so every emitted containment is exact
    (kept ∩ + hot ∩ = full sketch ∩; fingerprints are distinct per
    doc). The adaptive `has_hot` probe (one cached scalar) keeps a
    clean corpus — the fixture — on the plain two-stage plan with
    zero patch joins (the r3 candidate-then-reverify formulation
    re-intersected FULL sketches per pair: measured 8.3s vs 2.3s at
    sf0.1)."""
    fps = scoped_persist(winnow_fingerprints(docs))
    flat = fps.select("doc_id", F.explode("fps").alias("fp"))
    hot = scoped_persist(
        flat.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("pc"))
        .where(F.col("pc") > cap)
        .select("fp")
    )
    has_hot = bool(hot.head(1))
    kept = flat.join(F.broadcast(hot), "fp", "left_anti") if has_hot else flat
    a, b = kept.alias("a"), kept.alias("b")
    # NO join-strategy hint on purpose: unlike t02's shingle join, the
    # winnowing posting stream is 8×-compressed, so at bench SF the
    # exploded side is broadcast-sized and AQE's runtime choice
    # (broadcast here, shuffle-hash once the index outgrows the
    # threshold) beats a forced shuffle 5× (measured 1.1s vs 5.6s at
    # sf0.1) — exactly the decision AQE exists to make per actual
    # sizes.
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("kept_shared"))
    )
    sz = fps.select("doc_id", F.size("fps").cast("bigint").alias("n_fp"))
    out = pairs.join(
        sz.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("na")), "doc_a"
    ).join(sz.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("nb")), "doc_b")
    if has_hot:
        hot_arr = (
            flat.join(F.broadcast(hot), "fp")
            .groupBy("doc_id")
            .agg(F.collect_list("fp").alias("ha"))
        )
        out = (
            out.join(
                hot_arr.select(F.col("doc_id").alias("doc_a"), F.col("ha").alias("h_a")),
                "doc_a",
                "left",
            )
            .join(
                hot_arr.select(F.col("doc_id").alias("doc_b"), F.col("ha").alias("h_b")),
                "doc_b",
                "left",
            )
            .withColumn(
                "n_shared",
                F.col("kept_shared")
                + F.when(
                    F.col("h_a").isNotNull() & F.col("h_b").isNotNull(),
                    F.size(F.array_intersect("h_a", "h_b")),
                ).otherwise(F.lit(0)),
            )
        )
    else:
        out = out.withColumn("n_shared", F.col("kept_shared"))
    out = (
        out.withColumn("containment", F.col("n_shared") / F.least("na", "nb"))
        .where(F.col("containment") >= WINNOW_CONTAINMENT)
    )
    return out.select(
        "doc_a",
        "doc_b",
        F.col("n_shared").cast("bigint").alias("n_shared"),
        F.round("containment", 6).alias("containment"),
    )


def _t22_oracle(slice_mod: int | None = None, residue: int = 0) -> str:
    """Vectorized DuckDB replica of the winnowing containment pipeline
    (VERDICT r6 #3 — the per-doc comprehension form was O(chars × k) +
    O(grams × w) interpreted lambda evals and exceeded a 10-min budget
    at sf0.5). Identical semantics, native execution:
    - k-gram rolling hashes: each (doc, pos, code) row contributes
      code·31^(k-1-j) to gram start pos−j; summing before one mod is
      exact (Σ code·31⁷ < 2⁶³) and HAVING COUNT(*)=k keeps exactly
      the in-bounds gram starts the comprehension generated.
    - window minima: MIN() OVER w-row frames on the gi-ordered gram
      rows replaces the per-window list_min slices.
    - containment: shared count = kept co-occurrence group-by (the
      same self-join that defines candidacy) + hot-fingerprint
      remainder — the engine's own cap-patch algebra; identical to
      len(list_intersect(…)) since flat = kept ∪ hot postings
      disjointly, and it avoids the candidates × full-sketch join
      (Σ|fps| over candidates ≈ billions of rows at sf0.5).
    - the pk pre-filter is a SOUND upper bound (hot_shared ≤
      min(nh_a, nh_b)), so pairs that cannot reach the containment
      threshold skip the exact hot patch.
    Parallel unnests in one SELECT zip positionally in DuckDB (the
    (code, position) explode).

    ``slice_mod``: the sampled-slice verification knob (VERDICT r6 #3
    option b). The generated-fixture geometry defeats the pk bound at
    sf0.5 — ~58M of 312M possible pairs share a kept fingerprint AND
    ~20 hot fingerprints per doc make the upper bound pass almost
    everywhere, so the exact hot patch would be a ~1.2B-row join.
    With slice_mod=N the ks self-join keeps only doc_a % N = 0 —
    1/N of the pair volume, same full corpus on the doc_b side — and
    the result is the exact containment output restricted to that
    slice, hash-comparable against the engine's full result filtered
    the same way. Sound because every pipeline stage upstream of ks
    is slice-independent (full-corpus postings, hot set, sizes).
    ``residue`` widens the evidence across DISTINCT slices (VERDICT r7
    #6): verifying doc_a % N = r for several r covers several disjoint
    1/N fractions of the full output under the same full-corpus
    candidate structure."""
    slice_pred = (
        f"AND a.doc_id % {slice_mod} = {residue}" if slice_mod else ""
    )
    return f"""
    WITH codes AS MATERIALIZED (
      SELECT doc_id,
             list_transform(list_filter(string_split(text, ''), x -> x <> ''),
                            x -> CAST(ascii(x) AS BIGINT)) AS cs
      FROM documents
    ),
    ch AS MATERIALIZED (
      SELECT doc_id, unnest(cs) AS c,
             unnest(generate_series(1, len(cs))) AS i
      FROM codes
    ),
    js(j, wj) AS (VALUES {", ".join(f"({j}, CAST({31 ** (WINNOW_K - 1 - j)} AS BIGINT))" for j in range(WINNOW_K))}),
    gh AS MATERIALIZED (
      SELECT doc_id, i - j AS gi, SUM(c * wj) % {WINNOW_MOD} AS h
      FROM ch CROSS JOIN js
      GROUP BY 1, 2
      HAVING COUNT(*) = {WINNOW_K}
    ),
    wmn AS MATERIALIZED (
      SELECT doc_id,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY gi
                          ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS wm,
             COUNT(*) OVER (PARTITION BY doc_id) AS ng,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY gi) AS rn
      FROM gh
    ),
    flat AS MATERIALIZED (
      SELECT DISTINCT doc_id, wm AS fp FROM wmn
      WHERE ng >= {WINNOW_W} AND rn <= ng - {WINNOW_W - 1}
      UNION
      SELECT doc_id, MIN(h) AS fp FROM gh
      GROUP BY doc_id HAVING COUNT(*) < {WINNOW_W}
    ),
    fsz AS MATERIALIZED (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nfp FROM flat GROUP BY doc_id
    ),
    hot AS MATERIALIZED (
      SELECT fp FROM flat GROUP BY fp
      HAVING count(*) > {WINNOW_MAX_POSTINGS}
    ),
    kept AS MATERIALIZED (
      SELECT flat.doc_id, flat.fp FROM flat ANTI JOIN hot USING (fp)
    ),
    ks AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS kept_shared
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      {slice_pred}
      GROUP BY 1, 2
    ),
    he AS MATERIALIZED (SELECT flat.doc_id, flat.fp FROM flat SEMI JOIN hot USING (fp)),
    hn AS MATERIALIZED (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nh FROM he GROUP BY doc_id
    ),
    pk AS MATERIALIZED (
      SELECT k.doc_a, k.doc_b, k.kept_shared, za.nfp AS nfa, zb.nfp AS nfb
      FROM ks k
      JOIN fsz za ON k.doc_a = za.doc_id
      JOIN fsz zb ON k.doc_b = zb.doc_id
      LEFT JOIN hn ha ON k.doc_a = ha.doc_id
      LEFT JOIN hn hb ON k.doc_b = hb.doc_id
      WHERE (k.kept_shared + least(COALESCE(ha.nh, 0), COALESCE(hb.nh, 0)))
            * 1.0 / least(za.nfp, zb.nfp) >= {WINNOW_CONTAINMENT}
    ),
    hr AS (
      SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS hot_shared
      FROM pk p
      JOIN he ha ON ha.doc_id = p.doc_a
      JOIN he hb ON hb.doc_id = p.doc_b AND hb.fp = ha.fp
      GROUP BY 1, 2
    ),
    v AS (
      SELECT p.doc_a, p.doc_b, p.nfa, p.nfb,
             p.kept_shared + COALESCE(h.hot_shared, 0) AS n_shared
      FROM pk p LEFT JOIN hr h ON p.doc_a = h.doc_a AND p.doc_b = h.doc_b
    )
    SELECT doc_a, doc_b, n_shared,
           ROUND(n_shared * 1.0 / least(nfa, nfb), 6) AS containment
    FROM v
    WHERE n_shared * 1.0 / least(nfa, nfb) >= {WINNOW_CONTAINMENT}
    """


@register(
    "t22_winnow_containment_pairs",
    oracle=_t22_oracle(),
    tags=("text", "fingerprint", "winnowing", "dedup"),
)
def t22_winnow_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm) + containment pairs — the
    fingerprint-family scale-out of t08's whole-document hash.
    Whole-doc hashes only catch EXACT duplicates and MinHash estimates
    whole-doc resemblance; winnowing guarantees any shared substring
    of length ≥ w+k−1 chars leaves a common fingerprint, so
    CONTAINMENT — one document quoting a chunk of another — is
    detectable, the case both t01 and t03 miss by design.

    Pairing is t02's capped-postings machinery: fingerprints posted
    by more than {WINNOW_MAX_POSTINGS} documents (boilerplate) are
    dropped from candidate generation — without the cap one hot
    boilerplate fingerprint emits O(postings²) pairs, the 100 TB skew
    killer. Shared counts stay EXACT: the codegen self-join+agg
    counts non-hot overlap and the hot remainder is patched from tiny
    per-doc hot-fingerprint arrays (adaptive — a hot-free corpus pays
    zero patch joins). Exchanges carry 8-byte fingerprint keys; the
    hot set is tiny by construction and broadcasts. Skew behavior
    pinned by tests/test_dedup.py::test_winnow_cap_bounds_candidates."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    return winnow_containment_pairs(docs)


BM25_K1 = 1.2
BM25_B = 0.75
BM25_N_QUERY_TERMS = 3
BM25_TOP_DOCS = 10


# BM25 scoring as a reusable WITH-body fragment: t24's oracle is
# f"WITH {_BM25_CTE_BODY} <final select>", and s16 (hybrid RRF in
# functions/similarity.py) chains the identical fragment so its fused
# sparse ranks are definitionally t24's.
_BM25_CTE_BODY = f"""w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    tf AS (
      SELECT doc_id, t AS tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(ws) AS t FROM w) GROUP BY 1, 2
    ),
    dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w),
    stats AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (SELECT SUM(len(ws)) * 1.0 / COUNT(*) FROM w) AS avgdl
    ),
    dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
                     CAST(SUM(tf) AS BIGINT) AS corpus_tf
              FROM tf GROUP BY 1),
    query_terms AS (
      SELECT tok, df FROM dfreq
      WHERE NOT list_contains({_sql_list(STOPWORDS["en"])}, tok)
      ORDER BY corpus_tf DESC, tok LIMIT {BM25_N_QUERY_TERMS}
    ),
    scored AS (
      SELECT tf.doc_id,
             SUM(
               ln((stats.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
               * (tf.tf * ({BM25_K1} + 1.0))
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
             ) AS score
      FROM tf
      JOIN query_terms q USING (tok)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY 1
    )"""


@register(
    "t24_bm25_ranking",
    oracle=f"""
    WITH {_BM25_CTE_BODY}
    SELECT doc_id, ROUND(score, 6) AS bm25, rk FROM (
      SELECT doc_id, score, CAST(ROW_NUMBER() OVER (
        ORDER BY ROUND(score, 6) DESC, doc_id
      ) AS BIGINT) AS rk FROM scored
    ) WHERE rk <= {BM25_TOP_DOCS}
    """,
    tags=("text", "bm25", "retrieval"),
)
def t24_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking (Robertson & Walker's Okapi weighting,
    the Lucene +1-idf variant) — the sparse-retrieval member of the
    trio t19 (TF-IDF weights) / t24 (BM25 ranking) / s09 (dense
    MaxSim). Pytest-only (family rep: t17, the corpus-statistics
    slot). The query is SELF-DERIVED so the oracle needs no literals:
    the top-{3} non-stopword tokens by corpus frequency (exact-int
    counts, token tiebreak — both engines select identically).

    Plan: the explode→(doc,tok) hash agg is the same staging table as
    t19; document lengths and the corpus (N, avgdl) scalar broadcast;
    the query-term table is {3} rows — the scoring join is a broadcast
    against the tf stream, the per-doc sum is a keyed aggregate, and
    the global top-{10} is TakeOrderedAndProject on the ROUNDED score
    (doc_id tiebreak), so float summation order cannot flip ranks."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    # persist the tokenized projection: it feeds the tf explode, the
    # doc-length table AND the corpus stats scalar — without the cache
    # Catalyst re-expands the scan+split once per consumer (t17's
    # pattern; three corpus scans instead of one at 100 TB).
    tokd = scoped_persist(
        docs.select("doc_id", F.split(F.lower(F.col("text")), " ").alias("ws"))
    )
    toks = tokd.select("doc_id", F.explode("ws").alias("tok"))
    tf = scoped_persist(
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dl = tokd.select("doc_id", F.size("ws").cast("bigint").alias("dl"))
    stats = tokd.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size("ws")) * F.lit(1.0) / F.count(F.lit(1))).alias("avgdl"),
    )
    dfreq = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("corpus_tf"),
    )
    stop = F.array(*[F.lit(x) for x in STOPWORDS["en"]])
    query_terms = (
        dfreq.where(~F.array_contains(stop, F.col("tok")))
        .orderBy(F.col("corpus_tf").desc(), "tok")
        .limit(BM25_N_QUERY_TERMS)
        .select("tok", "df")
    )
    scored = (
        tf.join(F.broadcast(query_terms), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                )
                * (F.col("tf") * (BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.sum("part").alias("score"))
    )
    out = (
        scored.orderBy(F.round("score", 6).desc(), "doc_id")
        .limit(BM25_TOP_DOCS)
        .select(
            "doc_id",
            F.round("score", 6).alias("bm25"),
        )
    )
    from pyspark.sql import Window as W

    rk = F.row_number().over(W.orderBy(F.col("bm25").desc(), "doc_id"))
    return out.withColumn("rk", rk.cast("bigint"))


DECON_NGRAM = 8  # tokens per contamination n-gram
DECON_EVAL_MOD = 50  # doc_id % 50 == 0 plays the held-out eval set


def decontamination_gram_hashes(docs: DataFrame, n: int = DECON_NGRAM) -> DataFrame:
    """Distinct (doc_id, h): one md5-family hash per sliding {n}-token
    window (cross-engine md5-slice family, dedup.md5_int_hash)."""
    from fsharp_mapreduce_spark.functions.dedup import md5_int_hash

    ws = F.split(F.lower(F.col("text")), " ")
    grams = F.when(
        F.size("ws") >= n,
        F.expr(
            f"transform(sequence(1, size(ws) - {n} + 1), "
            f"i -> array_join(slice(ws, i, {n}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", ws.alias("ws"))
        .select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", md5_int_hash(F.col("gram")).alias("h"))
        .distinct()
    )


def decontaminate(docs: DataFrame, eval_docs: DataFrame | None = None) -> DataFrame:
    """Per-training-doc count of {DECON_NGRAM}-gram hashes shared with
    the eval set. ``eval_docs`` is the real API: any (doc_id, text)
    DataFrame plays the held-out benchmark. When None, the
    deterministic doc_id % {DECON_EVAL_MOD} slice of ``docs`` stands
    in (the registered fixture query) — in that mode the (doc, hash)
    projection is persisted so the corpus is scanned ONCE: both the
    eval-hash derivation and the training-side probe read the cache
    (VERDICT r3 #1 — Catalyst re-expands shared subtrees otherwise)."""
    if eval_docs is None:
        gh = scoped_persist(decontamination_gram_hashes(docs))
        ev = gh.where(F.col("doc_id") % DECON_EVAL_MOD == 0).select("h").distinct()
        train = gh.where(F.col("doc_id") % DECON_EVAL_MOD != 0)
    else:
        # separate eval table: its gram derivation is a scan of the
        # (tiny) eval input, never a second corpus scan
        ev = decontamination_gram_hashes(eval_docs).select("h").distinct()
        train = decontamination_gram_hashes(docs)
    return (
        train.join(F.broadcast(ev), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_ngrams"))
    )


@register(
    "t25_decontaminate",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    g AS (
      SELECT doc_id, unnest(CASE WHEN len(ws) >= {DECON_NGRAM} THEN
               [list_aggregate(ws[i : i + {DECON_NGRAM - 1}], 'string_agg', ' ')
                for i in generate_series(1, len(ws) - {DECON_NGRAM} + 1)]
             ELSE [] END) AS gram
      FROM w
    ),
    gh AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(gram), 1, 12))::BIGINT % 2147483647 AS h
      FROM g
    ),
    ev AS (SELECT DISTINCT h FROM gh WHERE doc_id % {DECON_EVAL_MOD} = 0)
    SELECT gh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
    FROM gh JOIN ev USING (h)
    WHERE gh.doc_id % {DECON_EVAL_MOD} <> 0
    GROUP BY 1
    """,
    tags=("text", "decontamination", "ngram"),
)
def t25_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the GPT-3-style n-gram overlap scan
    (Brown et al. 2020, appendix C): flag every training document that
    shares an {8}-token n-gram with the held-out eval set. The real
    API (`decontaminate`) takes the eval set as a second DataFrame;
    the registered query uses the deterministic doc_id % {50} fixture
    slice so the oracle replays exactly. Distinct from dedup: the
    comparison is ASYMMETRIC — a tiny probe set against the full
    corpus — so the plan broadcasts the eval-gram hashes and the
    corpus side never shuffles for the membership test.

    Per doc: sliding {8}-token windows → one native md5 per gram →
    distinct (doc, hash) — persisted, ONE corpus scan feeds both the
    eval derivation and the training probe (plan-pinned by
    tests/test_plans.py::test_t25_single_corpus_scan) → broadcast-join
    against the eval hash set → per-doc hit count. Exchanges carry
    8-byte hashes, never gram text; the 48-bit→M31 hash space makes a
    false hit ~n_eval_grams/2³¹ per gram — identical in both engines,
    so the oracle replays exactly."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    return decontaminate(docs)


FUNNEL_SAMPLE_PCT = 50  # final deterministic subsample rate (%)


@register(
    "t28_preprocess_funnel",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text,
             string_split(lower(text), ' ') AS ws,
             len(list_filter(string_split(lower(text), ' '),
                 t -> len(t) >= {CLEAN_MIN_TOKEN_LEN}
                      AND NOT list_contains({_sql_list(STOPWORDS["en"])}, t)))
               >= {CLEAN_MIN_TOKENS} AS clean_keep
      FROM documents
    ),
    fq AS (
      SELECT doc_id, text, clean_keep,
             (ROUND(1.0 - len(list_distinct(ws)) * 1.0 / len(ws), 6)
                <= {REP_MAX_DUP_TOKEN_RATIO}
              AND CASE WHEN len(ws) < 2 THEN TRUE
                  ELSE ROUND(1.0 - len(list_distinct(
                         [ws[i] || ' ' || ws[i+1]
                          for i in generate_series(1, len(ws) - 1)]))
                       * 1.0 / (len(ws) - 1), 6) <= {REP_MAX_DUP_BIGRAM_RATIO}
                  END) AS qual_keep
      FROM f
    ),
    s2 AS (SELECT doc_id, text FROM fq WHERE clean_keep AND qual_keep),
    k AS (SELECT md5(text) AS dg, MIN(doc_id) AS keeper FROM s2 GROUP BY 1),
    j AS (
      SELECT s2.doc_id, (s2.doc_id = k.keeper) AS dedup_keep
      FROM s2 JOIN k ON md5(s2.text) = k.dg
    ),
    a1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN clean_keep THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN clean_keep AND qual_keep THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM fq
    ),
    a2 AS (
      SELECT CAST(SUM(CASE WHEN dedup_keep THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(SUM(CASE WHEN dedup_keep
                  AND (('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
                       % 2147483647) % 100 < {FUNNEL_SAMPLE_PCT}
                  THEN 1 ELSE 0 END) AS BIGINT) AS n4
      FROM j
    )
    SELECT stage, stage_name, n_docs FROM (
      SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name, n0 AS n_docs FROM a1
      UNION ALL SELECT 1, 'clean', n1 FROM a1
      UNION ALL SELECT 2, 'quality', n2 FROM a1
      UNION ALL SELECT 3, 'dedup', n3 FROM a2
      UNION ALL SELECT 4, 'sample', n4 FROM a2
    )
    """,
    tags=("text", "pipeline", "funnel"),
)
def t28_preprocess_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-to-end preprocessing funnel every training
    pipeline runs, as ONE declarative plan with per-stage survivor
    counts: raw → cleaning (t18's empty-shell rule) → repetition
    quality (t20's Gopher thresholds) → exact dedup keeper (t01's
    min-doc_id-per-digest) → deterministic {50}% subsample (t13's
    hash rule). The output is the funnel audit (stage, name, count) —
    the first artifact anyone asks for from a preprocessing run.

    Scale shape: stages 1-2 are flag EXPRESSIONS on one corpus scan
    (no materialization between stages — Catalyst fuses the whole
    filter chain into the scan projection); the dedup stage is t01's
    digest-keyed exchange over stage-2 survivors only; the sample
    flag is map-only. Two aggregates (conditional sums) + a 5-row
    stack — nothing corpus-sized ever hits the driver."""
    from fsharp_mapreduce_spark.functions.sampling import hash_bucket

    docs = fan_out(table(spark, sf_dir, "documents"))
    ws = F.split(F.lower(F.col("text")), " ")
    flags = (
        docs.select("doc_id", "text", ws.alias("ws"))
        .withColumn("bg", bigram_strings_col("ws"))
        .select(
            "doc_id",
            "text",
            clean_keep_col(F.col("ws")).alias("clean_keep"),
            repetition_keep_col("ws", "bg").alias("qual_keep"),
        )
    )
    a1 = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum(F.col("clean_keep").cast("long")).cast("bigint").alias("n1"),
        F.sum((F.col("clean_keep") & F.col("qual_keep")).cast("long"))
        .cast("bigint")
        .alias("n2"),
    )
    # digest projected BEFORE the join so the exchange carries 32-byte
    # keys + doc_id, never document bodies (t01's rule)
    s2 = flags.where(F.col("clean_keep") & F.col("qual_keep")).select(
        "doc_id", F.md5("text").alias("dg")
    )
    k = s2.groupBy("dg").agg(F.min("doc_id").alias("keeper"))
    j = s2.join(k, "dg").select(
        "doc_id", (F.col("doc_id") == F.col("keeper")).alias("dedup_keep")
    )
    samp = hash_bucket(F.col("doc_id").cast("string"), 100) < FUNNEL_SAMPLE_PCT
    a2 = j.agg(
        F.sum(F.col("dedup_keep").cast("long")).cast("bigint").alias("n3"),
        F.sum((F.col("dedup_keep") & samp).cast("long")).cast("bigint").alias("n4"),
    )
    return a1.crossJoin(a2).select(
        F.expr(
            "stack(5, 0L, 'raw', n0, 1L, 'clean', n1, 2L, 'quality', n2, "
            "3L, 'dedup', n3, 4L, 'sample', n4) AS (stage, stage_name, n_docs)"
        )
    )


SEQ_BUDGET = 256  # token budget per packed training sequence
N_PACK_BUCKETS = 8  # parallel packing lanes (cluster-width-scaled)


@register(
    "t29_sequence_pack",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, len(string_split(lower(text), ' ')) AS n FROM documents
    ),
    c AS (
      SELECT doc_id,
             unnest(generate_series(0,
               CASE WHEN n <= {CHUNK_TOKENS} THEN 0
                    ELSE CAST(ceil((n - {CHUNK_TOKENS}) * 1.0 / {CHUNK_STRIDE}) AS BIGINT)
               END)) AS chunk_idx,
             n
      FROM w
    ),
    b AS (
      SELECT doc_id, chunk_idx,
             CAST(least({CHUNK_TOKENS}, n - chunk_idx * {CHUNK_STRIDE}) AS BIGINT)
               AS n_tokens,
             CAST((('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
                   % 2147483647) % {N_PACK_BUCKETS} AS BIGINT) AS bucket
      FROM c
    ),
    p AS (
      SELECT bucket, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY bucket ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
      FROM b
    )
    SELECT bucket,
           CAST(pre // {SEQ_BUDGET} AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM p
    GROUP BY 1, 2
    """,
    tags=("text", "packing", "chunking"),
)
def t29_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the training-prep step after chunking:
    assign every t16 chunk to a fixed-budget ({SEQ_BUDGET}-token)
    training sequence so samples fill the context window instead of
    wasting it on padding. Deterministic distributed formulation:
    chunks land in {N_PACK_BUCKETS} hash buckets (the parallel packing
    lanes — sized to cluster width at scale), each lane packs greedily
    in (doc_id, chunk_idx) order via an EXCLUSIVE running token sum,
    sequence id = pre_sum div budget. No RNG, no driver loop — one
    keyed exchange on the bucket, one window per lane, rerun- and
    partitioning-invariant (the same property as t13's sampling).
    Chunk lengths are derived arithmetically (min(chunk, n - i*stride))
    — the chunk TEXT never materializes for packing. Output is the
    per-sequence audit (chunk count + filled tokens ≈ budget)."""
    from fsharp_mapreduce_spark.functions.sampling import hash_bucket
    from pyspark.sql import Window as W

    docs = fan_out(table(spark, sf_dir, "documents"))
    n = F.size(F.split(F.lower(F.col("text")), " "))
    last_idx = F.when(n <= CHUNK_TOKENS, F.lit(0)).otherwise(
        F.ceil((n - CHUNK_TOKENS) / F.lit(CHUNK_STRIDE)).cast("int")
    )
    c = docs.select(
        "doc_id", n.alias("n"), F.explode(F.sequence(F.lit(0), last_idx)).alias("chunk_idx")
    )
    b = c.select(
        "doc_id",
        "chunk_idx",
        F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("chunk_idx") * CHUNK_STRIDE)
        .cast("bigint")
        .alias("n_tokens"),
        hash_bucket(F.col("doc_id").cast("string"), N_PACK_BUCKETS)
        .cast("bigint")
        .alias("bucket"),
    )
    w = (
        W.partitionBy("bucket")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    p = b.select(
        "bucket",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("pre"),
    )
    return p.groupBy(
        "bucket", F.floor(F.col("pre") / SEQ_BUDGET).cast("bigint").alias("seq_id")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


# --- t31: count-min sketch heavy-hitter audit (cross-engine exact) ---
CMS_DEPTH = 4  # hash rows (d)
CMS_WIDTH = 256  # counters per row (w) → ε = e/w ≈ 1%, δ = e^-d ≈ 2%
CMS_TOP = 20  # heavy hitters audited


def cms_cells(token: Column, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> Column:
    """array of (row, cell) for a token across the d hash rows — the
    house md5-slice family salted with the row index, so DuckDB
    replays the identical cells: cell_i = md5_int('i:' || token) % w."""
    from fsharp_mapreduce_spark.functions.dedup import md5_int_hash

    return F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                (md5_int_hash(F.concat(F.lit(f"{i}:"), token)) % width).alias("c"),
            )
            for i in range(depth)
        ]
    )


@register(
    "t31_count_min_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    cells AS (
      SELECT r, ('0x' || substr(md5(r || ':' || token), 1, 12))::BIGINT
               % 2147483647 % {CMS_WIDTH} AS c,
             COUNT(*) AS n
      FROM toks, generate_series(0, {CMS_DEPTH - 1}) t(r)
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT token, COUNT(*) AS exact_n FROM toks GROUP BY token
    ),
    heavy AS (
      SELECT token, exact_n FROM (
        SELECT token, exact_n,
               ROW_NUMBER() OVER (ORDER BY exact_n DESC, token) AS rk
        FROM exact) WHERE rk <= {CMS_TOP}
    ),
    est AS (
      SELECT h.token, h.exact_n, MIN(cl.n) AS est_n
      FROM heavy h, generate_series(0, {CMS_DEPTH - 1}) t(r)
      JOIN cells cl
        ON cl.r = t.r
       AND cl.c = ('0x' || substr(md5(t.r || ':' || h.token), 1, 12))::BIGINT
                  % 2147483647 % {CMS_WIDTH}
      GROUP BY h.token, h.exact_n
    )
    SELECT token, CAST(exact_n AS BIGINT) AS exact_n,
           CAST(est_n AS BIGINT) AS est_n
    FROM est
    """,
    tags=("text", "sketch", "count_min", "heavy_hitters"),
)
def t31_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter audit — the third sketch family
    (q32 HLL cardinality, q37 approx quantiles) and the only one with
    a FULL cross-engine value-hash oracle: the sketch's hash rows use
    the house md5-slice family (salted per row), so DuckDB rebuilds
    the identical {CMS_DEPTH}×{CMS_WIDTH} counter table and the
    identical point estimates — no engine-native sketch black box.

    The 100 TB story is the sketch's whole point: the counter table
    is d×w = {CMS_DEPTH * CMS_WIDTH} cells REGARDLESS of token
    cardinality — a stream ingests instances straight into (row,
    cell) partials with O(d·w) state and map-side combine; the
    estimate is min_i(cell[i, h_i(token)]), an overestimate by at
    most εN with ε ≈ e/w (pinned by
    tests/test_dedup.py::test_t31_cms_bounds together with
    est_n ≥ exact_n).

    This registered query is the batch AUDIT of that sketch, and the
    audit needs exact counts anyway — so it fuses everything onto ONE
    corpus-mass token aggregation (VERDICT r10 #6: the previous shape
    paid TWO instance-mass exchanges, 4×instances of (r, c) structs
    into the sketch agg plus instances into the exact agg, and ran
    the d md5 hashes once per token INSTANCE). The (token, n) table
    is vocabulary-sized (Heaps' law: ∝ corpus^~0.5), the d-row cell
    mapping and its md5s now run per DISTINCT token, and the sketch
    cells are the n-weighted sum — bit-identical counter values, ~5×
    less exchange mass, d× less hashing. The audit emits est vs
    exact for the top-{CMS_TOP} tokens.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    # ONE corpus-mass exchange: (token, count) with map-side combine.
    # Persisted — it feeds both the sketch build and the top-k.
    tok_counts = scoped_persist(
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    )
    # the sketch: built from the vocabulary-sized count table — the
    # (r, c) explode and its md5s touch each distinct token once; the
    # counter values equal the instance-stream ingest by linearity
    cells = (
        tok_counts.select(
            F.col("exact_n"), F.explode(cms_cells(F.col("token"))).alias("rc")
        )
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.sum("exact_n").alias("n"))
    )
    # audited keys: top-N exact tokens (deterministic tie-break;
    # vocabulary-sized global window, the t19 bounded-dim pattern)
    from pyspark.sql import Window as W

    exact = tok_counts
    w = W.orderBy(F.col("exact_n").desc(), "token")
    heavy = (
        exact.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= CMS_TOP)
        .select("token", "exact_n")
    )
    # point estimates: explode each heavy token's d cells, join the
    # sketch (broadcast — the sketch is ≤ d×w rows by construction),
    # min over rows
    probes = heavy.select(
        "token", "exact_n", F.explode(cms_cells(F.col("token"))).alias("rc")
    ).select("token", "exact_n", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    est = (
        probes.join(F.broadcast(cells), ["r", "c"])
        .groupBy("token", "exact_n")
        .agg(F.min("n").alias("est_n"))
    )
    return est.select(
        "token",
        F.col("exact_n").cast("bigint").alias("exact_n"),
        F.col("est_n").cast("bigint").alias("est_n"),
    )


# --- t34: fuzzy string matching (edit-distance join with blocking) ---
FUZZY_K = 2  # max edit distance
FUZZY_Q = 3  # positional q-gram width
# t02's stop-postings discipline for hot grams: a gram in more than
# this many strings is dropped from CANDIDATE GENERATION only. Safer
# here than for shingles: the count filter guarantees every true pair
# shares ≥ (L-q+1) - K·q ≈ 3 positional grams, so a pair survives
# unless ALL its shared grams are boilerplate-hot.
FUZZY_STOP_POSTINGS = 4096


def _pos_qgrams(name: Column, q: int = FUZZY_Q) -> Column:
    """array<struct<pos int, gram string>> — every positional q-gram
    of the lowercased string. Expression-only."""
    s = F.lower(name)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - q + 1, F.lit(1))),
        lambda p: F.struct(
            p.cast("int").alias("pos"), F.substring(s, p, q).alias("gram")
        ),
    )


@register(
    "t34_fuzzy_match",
    oracle=f"""
    WITH names AS (
      SELECT lower(p_name) AS nm, COUNT(*) AS n_copies
      FROM part GROUP BY lower(p_name)
    ),
    g AS (
      -- series bound derived from the fixture's own longest name
      -- (same latent hazard ADVICE r6 #1 flagged on t40/t41: a fixed
      -- literal diverges silently on a longer-named fixture)
      -- (the lateral generate_series table function only accepts
      -- constants; the scalar unnest(generate_series(..)) form takes
      -- the subquery bound)
      SELECT nm, t.p AS pos, substr(nm, t.p, {FUZZY_Q}) AS gram
      FROM names CROSS JOIN (SELECT unnest(generate_series(1,
          (SELECT MAX(length(nm)) FROM names))) AS p) t
      WHERE t.p <= GREATEST(length(nm) - {FUZZY_Q} + 1, 1)
    ),
    hot AS (
      SELECT gram FROM (SELECT gram, COUNT(DISTINCT nm) AS n FROM g GROUP BY gram)
      WHERE n > {FUZZY_STOP_POSTINGS}
    ),
    cand AS (
      SELECT DISTINCT a.nm AS na, b.nm AS nb
      FROM g a JOIN g b
        ON a.gram = b.gram
       AND abs(a.pos - b.pos) <= {FUZZY_K}
       AND a.nm < b.nm
       AND abs(length(a.nm) - length(b.nm)) <= {FUZZY_K}
      WHERE a.gram NOT IN (SELECT gram FROM hot)
    ),
    v AS (
      SELECT na, nb, levenshtein(na, nb) AS dist FROM cand
      WHERE levenshtein(na, nb) <= {FUZZY_K}
    ),
    ends AS (
      SELECT na AS nm, nb AS other, dist FROM v
      UNION ALL
      SELECT nb AS nm, na AS other, dist FROM v
    ),
    agg AS (
      SELECT nm, COUNT(*) AS n_fuzzy,
             first(other ORDER BY dist, other) AS best_match,
             CAST(MIN(dist) AS BIGINT) AS best_dist
      FROM ends GROUP BY nm
    )
    SELECT n.nm AS name, n.n_copies,
           COALESCE(a.n_fuzzy, 0) AS n_fuzzy,
           a.best_match, a.best_dist
    FROM names n LEFT JOIN agg a ON n.nm = a.nm
    """,
    tags=("text", "fuzzy", "entity_resolution", "edit_distance"),
)
def t34_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching — the entity-resolution canonicalization
    join (dedupe "Jon Smith" / "John Smith"): for every DISTINCT name
    in the corpus, its copy count plus the other distinct names
    within edit distance ≤ {FUZZY_K} (count, best match by
    (distance, name)). EXACT, not approximate, via positional
    q-gram blocking: two strings within distance K share at least
    (L-q+1) − K·q matching positional {FUZZY_Q}-grams (≥3 on this
    fixture's lengths), each within position shift ≤ K — so the gram
    equi-join with |Δpos| ≤ K and |Δlen| ≤ K guards generates a
    candidate superset, and every candidate is verified with the real
    levenshtein. Pinned exact vs brute force (incl. cross-length
    pairs) by tests/test_dedup.py::test_t34_fuzzy_blocking_is_exact.

    The DICTIONARY grain is the scale design, not a shortcut: the
    first aggregation collapses the corpus to its distinct strings
    (t01's digest-exchange shape — 64 names at every fixture SF,
    vocabulary-bounded in production), and ALL quadratic-risk work
    (gram join, verification) runs on that bounded dictionary — a
    row-grain formulation measured 18× wall-clock growth for 100×
    data here (duplicate names make row pairs quadratic) and was
    rejected. Hot boilerplate grams are droppable
    ({FUZZY_STOP_POSTINGS} cap, the t02 discipline — safer here
    thanks to the ≥3-shared-grams slack)."""
    part = table(spark, sf_dir, "part")
    names = scoped_persist(
        part.groupBy(F.lower("p_name").alias("nm")).agg(
            F.count(F.lit(1)).alias("n_copies")
        )
    )
    g = scoped_persist(
        names.select(
            "nm", F.explode(_pos_qgrams(F.col("nm"))).alias("pg")
        ).select("nm", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    )
    hot = g.groupBy("gram").agg(
        F.countDistinct("nm").alias("n")
    ).where(F.col("n") > FUZZY_STOP_POSTINGS).select("gram")
    gk = g.join(F.broadcast(hot), "gram", "left_anti")
    a = gk.select(F.col("nm").alias("na"), F.col("pos").alias("pa"), "gram")
    b = gk.select(F.col("nm").alias("nb"), F.col("pos").alias("pb"), "gram")
    cand = (
        a.join(
            b,
            (a.gram == b.gram)
            & (F.abs(F.col("pa") - F.col("pb")) <= FUZZY_K)
            & (F.col("na") < F.col("nb"))
            & (F.abs(F.length("na") - F.length("nb")) <= FUZZY_K),
        )
        .select("na", "nb")
        .distinct()
    )
    v = cand.withColumn("dist", F.levenshtein("na", "nb")).where(
        F.col("dist") <= FUZZY_K
    )
    ends = v.select(F.col("na").alias("nm"), F.col("nb").alias("other"), "dist").union(
        v.select(F.col("nb").alias("nm"), F.col("na").alias("other"), "dist")
    )
    agg = ends.groupBy("nm").agg(
        F.count(F.lit(1)).alias("n_fuzzy"),
        F.min_by("other", F.struct("dist", "other")).alias("best_match"),
        F.min("dist").cast("bigint").alias("best_dist"),
    )
    return names.join(agg, "nm", "left").select(
        F.col("nm").alias("name"),
        "n_copies",
        F.coalesce("n_fuzzy", F.lit(0)).cast("bigint").alias("n_fuzzy"),
        "best_match",
        "best_dist",
    )


def textrank_scores(
    docs: DataFrame,
    text_col: str = "text",
    damping: float = 0.85,
    teleport: float = 0.15,
    iters: int = 3,
) -> DataFrame:
    """TextRank (Mihalcea & Tarau 2004) keyword scores: weighted
    PageRank over the word co-occurrence graph (adjacent-token pairs,
    undirected, edge weight = co-occurrence count);
    PR'(v) = (1-d) + d·Σ_{u~v} w(u,v)/wdeg(u)·PR(u), PR₀ = 1. The
    teleport term is an explicit literal, NOT computed as 1.0-damping
    (Python evaluates 1.0-0.85 one ulp above 0.15, which would break
    the float-op-for-float-op identity with the oracle's literal
    0.15).

    The 100 TB shape, stage by stage: adjacency comes from a window
    lead() keyed by doc_id — ONE keyed exchange, no token self-join;
    the graph build is two hash aggregations over 8-byte-ish word
    pairs (map-side combined, corpus text never shuffles again after
    tokenization); edge weights are pre-normalized ONCE into `frac =
    w/wdeg` and persisted, so each PageRank iteration is a single
    join-based sparse matvec (edges ⋈ scores on src, aggregate by
    dst) — cost O(|E|) per round with map-side partial sums, the
    t12/t23 iteration discipline. Scores stay node-cardinality
    (vocabulary-sized: AQE broadcasts them at fixture scale, shuffles
    them keyed at web-vocabulary scale — both correct)."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("pos", "tok"),
    ).where(F.col("tok") != "")
    from pyspark.sql import Window as W

    win = W.partitionBy("doc_id").orderBy("pos")
    adj = (
        toks.withColumn("nxt", F.lead("tok").over(win))
        .where(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("tok")))
        .select(F.col("tok").alias("w1"), F.col("nxt").alias("w2"))
    )
    edges = (
        adj.select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
        .unionAll(adj.select(F.col("w2").alias("src"), F.col("w1").alias("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    wdeg = edges.groupBy("src").agg(F.sum("w").alias("wdeg"))
    ew = scoped_persist(
        edges.join(wdeg, "src").select(
            "src", "dst", (F.col("w") / F.col("wdeg")).alias("frac")
        )
    )
    scores = (
        ew.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("score", F.lit(1.0))
    )
    for _ in range(iters):
        scores = (
            ew.join(scores, ew["src"] == scores["node"])
            .groupBy("dst")
            .agg(
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.sum(F.col("frac") * F.col("score"))
                ).alias("score")
            )
            .withColumnRenamed("dst", "node")
        )
    return scores


_T35_PR_STEP = """
  SELECT e.dst AS node, 0.15 + 0.85 * SUM(e.w / d.wdeg * p.score) AS score
  FROM edges e JOIN wdeg d ON e.src = d.node JOIN {prev} p ON e.src = p.node
  GROUP BY e.dst
"""

_T35_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
  FROM documents
),
flt AS (SELECT * FROM toks WHERE tok <> ''),
prs AS (
  SELECT tok AS w1,
         LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM flt
),
pairs AS (SELECT w1, w2 FROM prs WHERE w2 IS NOT NULL AND w1 <> w2),
edges AS (
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w FROM (
    SELECT w1 AS src, w2 AS dst FROM pairs
    UNION ALL
    SELECT w2 AS src, w1 AS dst FROM pairs
  ) GROUP BY 1, 2
),
wdeg AS (SELECT src AS node, SUM(w) AS wdeg FROM edges GROUP BY 1),
pr0 AS (SELECT node, 1.0 AS score FROM wdeg),
pr1 AS ({_T35_PR_STEP.format(prev="pr0")}),
pr2 AS ({_T35_PR_STEP.format(prev="pr1")}),
pr3 AS ({_T35_PR_STEP.format(prev="pr2")})
SELECT node AS word, ROUND(score, 6) AS score
FROM pr3 ORDER BY 2 DESC, 1 LIMIT 20
"""


@register(
    "t35_textrank_keywords",
    oracle=_T35_SQL,
    tags=("text", "keywords", "graph", "pagerank"),
)
def t35_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level TextRank keywords: top-20 words by 3-iteration
    weighted PageRank over the adjacent-token co-occurrence graph —
    the graph-centrality complement to t19's frequency-based TF-IDF
    keywords (a word ranks high here by KEEPING HIGH-RANK COMPANY,
    not by raw count). The oracle unrolls the identical three matvec
    iterations as chained CTEs, float-op-for-float-op (frac·score
    with left-to-right division), so the value-hash match covers the
    fixpoint arithmetic, not just the graph build. Top-20 by rounded
    score with word tie-break (unique-key ordering rule); boundary
    gaps on the fixture are ~1e-3, far above cross-engine float
    noise."""
    docs = table(spark, sf_dir, "documents")
    scores = textrank_scores(docs)
    return (
        scores.select(
            F.col("node").alias("word"), F.round("score", 6).alias("score")
        )
        .orderBy(F.col("score").desc(), "word")
        .limit(20)
    )


DRIFT_BATCH_MOD = 7  # doc_id % 7 == 0 plays the incoming batch
DRIFT_SMOOTH = 0.5  # additive smoothing so unseen tokens stay finite


def distribution_drift(
    corpus_toks: DataFrame, batch_toks: DataFrame, smooth: float = DRIFT_SMOOTH
) -> DataFrame:
    """Token-distribution drift audit — the check a training-data
    pipeline runs on every incoming batch BEFORE mixing it in: PSI
    (population stability index, Σ(p_b−p_c)·ln(p_b/p_c) — the
    industry >0.2 = major-shift rule) and KL(batch‖corpus) between
    the smoothed token frequency distributions. Inputs are (…, tok)
    projections; the support is the CORPUS vocabulary (additive
    smoothing keeps batch-absent tokens finite; batch-novel tokens
    are a separate vocabulary-growth signal).

    100 TB shape: two map-side-combined hash aggregations to
    vocabulary grain, scalar totals broadcast, one keyed join on the
    8-byte-ish token — the corpora themselves never join or shuffle
    text."""
    corpus = corpus_toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c")
    )
    batch = batch_toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b")
    )
    return drift_from_counts(corpus, batch, smooth)


def drift_from_counts(
    corpus: DataFrame, batch: DataFrame, smooth: float = DRIFT_SMOOTH
) -> DataFrame:
    """The drift computation over pre-aggregated vocabulary-grain
    count tables ``(tok, n_c)`` / ``(tok, n_b)`` — the entry point
    when the batch counts were accumulated elsewhere (st16 sums them
    per micro-batch; an incremental pipeline would read them from a
    q49-style state table)."""
    tot = corpus.agg(
        F.sum("n_c").alias("t_c"), F.count(F.lit(1)).alias("v")
    ).crossJoin(batch.agg(F.sum("n_b").alias("t_b")))
    j = (
        corpus.join(batch, "tok", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            ((F.col("n_c") + smooth) / (F.col("t_c") + smooth * F.col("v"))).alias(
                "p_c"
            ),
            (
                (F.coalesce(F.col("n_b"), F.lit(0)) + smooth)
                / (F.col("t_b") + smooth * F.col("v"))
            ).alias("p_b"),
        )
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(
            F.sum((F.col("p_b") - F.col("p_c")) * F.log(F.col("p_b") / F.col("p_c"))),
            6,
        ).alias("psi"),
        F.round(F.sum(F.col("p_b") * F.log(F.col("p_b") / F.col("p_c"))), 6).alias(
            "kl_batch_vs_corpus"
        ),
    )


_T36_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
    ),
    flt AS (SELECT * FROM toks WHERE tok <> ''),
    corpus AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_c FROM flt GROUP BY 1
    ),
    batch AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_b
      FROM flt WHERE doc_id % {DRIFT_BATCH_MOD} = 0 GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT SUM(n_c) FROM corpus) AS t_c,
             (SELECT SUM(n_b) FROM batch) AS t_b
    ),
    j AS (
      SELECT
        (c.n_c + {DRIFT_SMOOTH}) /
          (t.t_c + {DRIFT_SMOOTH} * (SELECT COUNT(*) FROM corpus)) AS p_c,
        (COALESCE(b.n_b, 0) + {DRIFT_SMOOTH}) /
          (t.t_b + {DRIFT_SMOOTH} * (SELECT COUNT(*) FROM corpus)) AS p_b
      FROM corpus c LEFT JOIN batch b USING (tok) CROSS JOIN tot t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(SUM((p_b - p_c) * ln(p_b / p_c)), 6) AS psi,
           ROUND(SUM(p_b * ln(p_b / p_c)), 6) AS kl_batch_vs_corpus
    FROM j
    """


@register(
    "t36_distribution_drift",
    oracle=_T36_SQL,
    tags=("text", "drift", "quality", "psi"),
)
def t36_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`distribution_drift` with doc_id % {7} == 0 playing the
    incoming batch against the full document corpus: one row out —
    vocabulary size, PSI, and KL(batch‖corpus). On this fixture the
    batch is an unbiased slice so PSI ≈ 0.006 (stable, as it should
    be); the planted-drift test shows the same audit firing >0.2 on a
    genuinely shifted batch. The shared tokenized projection is
    persisted so corpus and batch counts ride ONE scan (the t19
    discipline)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = scoped_persist(
        docs.select(
            "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
        ).where(F.col("tok") != "")
    )
    return distribution_drift(
        toks, toks.where(F.col("doc_id") % DRIFT_BATCH_MOD == 0)
    )


NOVELTY_NGRAM = 3  # tokens per novelty n-gram
NOVELTY_BATCH_MOD = DRIFT_BATCH_MOD  # same batch slice as t36


def ngram_novelty(
    reference: DataFrame, batch: DataFrame, n: int = NOVELTY_NGRAM
) -> DataFrame:
    """Vocabulary-growth audit — t36's drift measures how the batch
    RE-WEIGHTS the known distribution; this measures what the batch
    ADDS: the fraction of the batch's distinct {n}-gram hashes absent
    from the reference corpus. The two together answer "is this feed
    shifting, growing, or both?" before it's mixed into training data.

    100 TB shape (the t25 discipline inverted): both sides reduce to
    8-byte md5-family gram hashes; the BATCH-derived distinct set is
    broadcast into a semi-join probe of the reference's gram stream,
    so the reference corpus is scanned once and never shuffled, and
    the only aggregates are batch-bounded distincts."""
    bh = decontamination_gram_hashes(batch, n=n).select("h").distinct()
    rh = decontamination_gram_hashes(reference, n=n).select("h")
    found = rh.join(F.broadcast(bh), "h", "left_semi").distinct()
    tot = bh.agg(F.count(F.lit(1)).cast("bigint").alias("n_batch_grams"))
    nf = found.agg(F.count(F.lit(1)).alias("n_found"))
    return tot.crossJoin(nf).select(
        "n_batch_grams",
        (F.col("n_batch_grams") - F.col("n_found")).cast("bigint").alias("n_novel"),
        F.round(
            F.lit(1.0) - F.col("n_found") * F.lit(1.0) / F.col("n_batch_grams"), 6
        ).alias("novelty_rate"),
    )


@register(
    "t37_ngram_novelty",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    g AS (
      SELECT doc_id, unnest(CASE WHEN len(ws) >= {NOVELTY_NGRAM} THEN
               [list_aggregate(ws[i : i + {NOVELTY_NGRAM - 1}], 'string_agg', ' ')
                for i in generate_series(1, len(ws) - {NOVELTY_NGRAM} + 1)]
             ELSE [] END) AS gram
      FROM w
    ),
    gh AS (
      SELECT doc_id, ('0x' || substr(md5(gram), 1, 12))::BIGINT % 2147483647 AS h
      FROM g
    ),
    batch AS (SELECT DISTINCT h FROM gh WHERE doc_id % {NOVELTY_BATCH_MOD} = 0),
    ref AS (SELECT DISTINCT h FROM gh WHERE doc_id % {NOVELTY_BATCH_MOD} <> 0),
    found AS (SELECT DISTINCT b.h FROM batch b JOIN ref r USING (h))
    SELECT CAST((SELECT COUNT(*) FROM batch) AS BIGINT) AS n_batch_grams,
           CAST((SELECT COUNT(*) FROM batch) - (SELECT COUNT(*) FROM found) AS BIGINT)
             AS n_novel,
           ROUND(1.0 - (SELECT COUNT(*) FROM found) * 1.0 /
                 (SELECT COUNT(*) FROM batch), 6) AS novelty_rate
    """,
    tags=("text", "novelty", "ngram", "drift"),
)
def t37_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ngram_novelty` with doc_id % {7} == 0 as the batch against the
    REST of the corpus (the batch is excluded from its own reference —
    a subset-batch would trivially score 0): one row out — distinct
    batch {3}-grams, how many are novel, the novelty rate (0.40 on
    this fixture: non-degenerate in both directions). Pairs with t36:
    drift says the feed re-weights what we have, novelty says how much
    it adds."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    batch = docs.where(F.col("doc_id") % NOVELTY_BATCH_MOD == 0)
    reference = docs.where(F.col("doc_id") % NOVELTY_BATCH_MOD != 0)
    return ngram_novelty(reference, batch)


# ---------------------------------------------------------------------------
# t40: BPE merge induction — tokenizer TRAINING as a distributed op
# ---------------------------------------------------------------------------

BPE_ROUNDS = 8


def _bpe_merge_expr(s: Column, lft: str, rgt: str) -> Column:
    """Apply one BPE merge (lft, rgt) → lft+rgt to a space-joined
    symbol string with the double-space trick, which makes leftmost
    non-overlapping string replacement EXACTLY equal to greedy
    left-to-right pairwise symbol merging (property-tested against a
    symbol-list reference in tests/test_dedup.py): doubling every
    delimiter gives each adjacency a private space on both sides, so
    consecutive merges in a run ('a a a a' → 'aa aa') don't starve
    each other the way single-space patterns do. Same replace
    semantics (leftmost, non-overlapping) in Spark, DuckDB, and
    Python — the oracle replays the identical algebra."""
    doubled = F.replace(F.concat(F.lit(" "), s, F.lit(" ")), F.lit(" "), F.lit("  "))
    merged = F.replace(
        doubled,
        F.lit(f" {lft}  {rgt} "),
        F.lit(f" {lft}{rgt} "),
    )
    return F.trim(F.replace(merged, F.lit("  "), F.lit(" ")))


# Above this many distinct words the merge loop stays distributed;
# below it the vocabulary is collected once and the rounds run
# driver-side. 2M words ≈ 100-200 MB of driver heap — the artifact
# every production tokenizer trainer (SentencePiece, HF tokenizers)
# holds in memory by design.
BPE_DRIVER_VOCAB_CAP = 2_000_000


def _greedy_list_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right pair merge on a symbol list — the textbook
    BPE definition, the same algebra `_bpe_merge_expr` reproduces as
    string replacement (property-tested equal exhaustively ≤6 symbols,
    tests/test_dedup.py::test_bpe_merge_formula_equals_list_merge)."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    docs: DataFrame,
    rounds: int = BPE_ROUNDS,
    driver_vocab_cap: int = BPE_DRIVER_VOCAB_CAP,
) -> DataFrame:
    """Byte-pair-encoding tokenizer training (Sennrich, Haddow & Birch
    2016, ACL — "Neural Machine Translation of Rare Words with Subword
    Units"). The corpus-scale work happens ONCE and is always
    distributed: explode to whitespace words and hash-aggregate to a
    (word, count) table — the only fact-sized shuffle. The merge
    rounds then run on the DISTINCT-WORD table, whose size is bounded
    by the vocabulary, independent of corpus size — the property that
    makes BPE trainable on 100 TB at all.

    Where the rounds run is a size decision (r10, VERDICT r9 #4): a
    vocabulary under ``driver_vocab_cap`` is collected once and the
    rounds run driver-side in pure Python — the reference algorithm
    the whole family is property-tested against — because each
    distributed round costs a full Spark job (~0.2 s scheduling floor)
    to scan a table that fits in L2 cache; 8 rounds of job floor was
    most of t40's bench price. This is how every production tokenizer
    trainer works: corpus counting scales out, the merge loop is a
    small in-memory artifact build. Vocabularies above the cap use
    the distributed per-round pipeline (pair counts via slice+zip_with
    JVM-side, 1-row bounded collect per round, `_bpe_merge_expr`
    rewrite — no shuffle per round). Both paths implement the same
    deterministic (count DESC, pair ASC) argmax — Python tuple order
    equals Spark/DuckDB binary string order because UTF-8 byte order
    preserves code-point order — and are pinned equal by
    tests/test_dedup.py. No end-of-word marker (the documented
    variant): merges never cross word boundaries because each row IS
    one word.

    Returns the trained merge table — (round_id, left_sym, right_sym,
    merged, pair_count), ``rounds`` rows — i.e. the tokenizer itself,
    in merge-priority order."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.array_join(
                F.filter(F.split("w", ""), lambda x: x != F.lit("")), " "
            ).alias("s"),
            "cnt",
        )
    )
    words = scoped_persist(words)
    out_schema = (
        "round_id bigint, left_sym string, right_sym string, "
        "merged string, pair_count bigint"
    )
    out_rows: list[tuple[int, str, str, str, int]] = []
    if words.count() <= driver_vocab_cap:
        vocab = [(r["s"].split(" "), int(r["cnt"])) for r in words.collect()]
        for r in range(1, rounds + 1):
            pc: dict[tuple[str, str], int] = {}
            for syms, cnt in vocab:
                for i in range(len(syms) - 1):
                    k = (syms[i], syms[i + 1])
                    pc[k] = pc.get(k, 0) + cnt
            if not pc:
                break
            (lft, rgt), best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            out_rows.append((r, lft, rgt, lft + rgt, int(best)))
            vocab = [
                (_greedy_list_merge(syms, lft, rgt), cnt) for syms, cnt in vocab
            ]
        return spark.createDataFrame(out_rows, out_schema)
    cur = words
    for r in range(1, rounds + 1):
        pairs = cur.select(
            F.expr(
                "explode(zip_with("
                "  slice(split(s, ' '), 1, size(split(s, ' ')) - 1),"
                "  slice(split(s, ' '), 2, size(split(s, ' ')) - 1),"
                "  (x, y) -> struct(x AS lft, y AS rgt)))"
            ).alias("p"),
            "cnt",
        ).select("p.lft", "p.rgt", "cnt")
        best = (
            pairs.groupBy("lft", "rgt")
            .agg(F.sum("cnt").alias("pc"))
            .orderBy(F.col("pc").desc(), "lft", "rgt")
            .limit(1)
            .collect()
        )
        if not best:
            break
        lft, rgt, pc = best[0]["lft"], best[0]["rgt"], int(best[0]["pc"])
        out_rows.append((r, lft, rgt, lft + rgt, pc))
        cur = cur.select(_bpe_merge_expr(F.col("s"), lft, rgt).alias("s"), "cnt")
    return spark.createDataFrame(out_rows, out_schema)


def _t40_oracle(rounds: int = BPE_ROUNDS) -> str:
    """Unrolled replica: one chained CTE block per merge round —
    DuckDB replays pair counting, the deterministic argmax, and the
    double-space merge algebra on its own engine, so the value-hash
    match covers every intermediate vocabulary state. Every CTE is
    MATERIALIZED: DuckDB inlines plain CTEs, and with words{{r}}
    referenced twice per round the inlined chain re-evaluates the
    corpus scan 2^rounds times (measured: >120 s at sf0.01 vs ~0.1 s
    materialized)."""
    parts = [
        """
    WITH words0 AS MATERIALIZED (
      SELECT array_to_string(list_filter(string_split(w, ''), x -> x <> ''), ' ') AS s,
             CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w
    )"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f"""
    , pairs{r} AS MATERIALIZED (
      -- series bound derived from the round's own longest symbol
      -- sequence (ADVICE r6 #1): a fixed literal (previously 64)
      -- silently assumed no word exceeds that many symbols and would
      -- make the oracle diverge on a longer-worded fixture
      SELECT l[i] AS lft, l[i + 1] AS rgt, SUM(cnt) AS pc
      FROM (SELECT string_split(s, ' ') AS l, cnt FROM words{p})
      CROSS JOIN (SELECT unnest(generate_series(1,
          (SELECT MAX(len(string_split(s, ' '))) FROM words{p}))) AS i)
      WHERE i <= len(l) - 1
      GROUP BY 1, 2
    ),
    best{r} AS MATERIALIZED (
      SELECT lft, rgt, pc FROM pairs{r} ORDER BY pc DESC, lft, rgt LIMIT 1
    ),
    words{r} AS MATERIALIZED (
      SELECT trim(replace(replace(replace(' ' || s || ' ', ' ', '  '),
               (SELECT ' ' || lft || '  ' || rgt || ' ' FROM best{r}),
               (SELECT ' ' || lft || rgt || ' ' FROM best{r})),
             '  ', ' ')) AS s, cnt
      FROM words{p}
    )""")
    union = "\n      UNION ALL ".join(
        f"SELECT {r} AS round_id, lft, rgt, pc FROM best{r}"
        for r in range(1, rounds + 1)
    )
    parts.append(f"""
    SELECT CAST(round_id AS BIGINT) AS round_id,
           lft AS left_sym, rgt AS right_sym,
           lft || rgt AS merged,
           CAST(pc AS BIGINT) AS pair_count
    FROM ({union})
    ORDER BY round_id""")
    return "".join(parts)


@register(
    "t40_bpe_merges",
    oracle=_t40_oracle(),
    tags=("text", "tokenizer", "bpe", "training"),
)
def t40_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`bpe_train` over the documents corpus: {BPE_ROUNDS} BPE merge
    rounds, emitting the learned merge table in priority order — the
    missing TRAINING half of the tokenizer story (t16/q35 apply
    tokenizers; t40 learns one from corpus statistics). Deterministic
    end to end: pair counts are exact integers and ties break
    lexicographically, so Spark and the unrolled DuckDB replica must
    agree on every round's argmax AND every intermediate vocabulary
    rewrite — one wrong merge anywhere cascades into a different
    round r+1 pair table and a hash mismatch."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    return bpe_train(docs)


# ---------------------------------------------------------------------------
# t41: BPE encode — APPLY the trained tokenizer corpus-wide
# ---------------------------------------------------------------------------

BPE_SEP = "§"  # word-boundary symbol: outside the corpus alphabet, so no
# trained merge can ever contain it — cross-word pairs (x, §)/(§, y)
# match nothing and merges stay word-internal without exploding to words


def _doc_symbol_string(text: Column) -> Column:
    """lower(text) → per-word space-joined characters, words joined by
    the {BPE_SEP} boundary symbol — the whole document as ONE symbol
    string, so the merge algebra runs as a narrow projection instead
    of a corpus-sized word explode."""
    words = F.filter(F.split(F.lower(text), " "), lambda w: w != F.lit(""))
    sym_words = F.transform(
        words,
        lambda w: F.array_join(
            F.filter(F.split(w, ""), lambda c: c != F.lit("")), " "
        ),
    )
    return F.array_join(sym_words, f" {BPE_SEP} ")


def bpe_encode(docs: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """Tokenizer APPLICATION — the other half of t40's training: learn
    the merge table once (`bpe_train`, ``rounds`` bounded 1-row
    collects), then encode EVERY document in ONE fused Arrow pass
    (VERDICT r9 #4: the previous chain of ``rounds`` nested
    `_bpe_merge_expr` column expressions rewrote the full doc-level
    symbol string once per round per OUTPUT expression — Catalyst does
    not CSE the chain across the token-count and digest projections,
    so the 8-round string algebra ran multiple times per document and
    the decade curve read 1.02×, flat). The fused encoder builds the
    symbol string JVM-side once (`_doc_symbol_string` — keeps the
    Unicode lower/split semantics that are hash-pinned against DuckDB
    out of Python), ships it through mapInPandas, and applies the
    merges in priority order with C-speed leftmost-non-overlapping
    str.replace — the SAME double-space algebra `_bpe_merge_expr`
    uses, property-tested equal to greedy list-merge exhaustively ≤6
    symbols (tests/test_dedup.py::test_bpe_merge_formula_equals_list_merge),
    so the unrolled MATERIALIZED-CTE oracle is unchanged. No explode,
    no shuffle: at 100 TB the encode pass is embarrassingly parallel
    map work (the trained table is driver-side by definition: a
    tokenizer IS a small artifact). Emits per-document symbol counts
    before/after plus an md5 slice of the encoded string, so a single
    wrong merge anywhere in training OR application shifts a digest
    and breaks the oracle."""
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs, rounds).orderBy("round_id").collect()
    ]
    sep = BPE_SEP
    id_type = dict(docs.dtypes)["doc_id"]
    staged = docs.select("doc_id", _doc_symbol_string(F.col("text")).alias("s0"))

    def encode_batches(batches):
        import hashlib

        import pandas as pd

        def ntok(x):
            return sum(1 for t in x.split(" ") if t and t != sep)

        for pdf in batches:
            s0 = pdf["s0"].fillna("")
            enc = s0
            for lft, rgt in merges:
                pat, rep = f" {lft}  {rgt} ", f" {lft}{rgt} "
                enc = (
                    (" " + enc + " ")
                    .str.replace(" ", "  ", regex=False)
                    .str.replace(pat, rep, regex=False)
                    .str.replace("  ", " ", regex=False)
                    # trim SPACES only (Spark trim / DuckDB trim): a
                    # leading newline/tab is a real symbol char and
                    # must survive
                    .str.strip(" ")
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_sym_chars": s0.map(ntok).astype("int64"),
                    "n_tokens_bpe": enc.map(ntok).astype("int64"),
                    "enc_digest": enc.map(
                        lambda x: hashlib.md5(x.encode("utf-8")).hexdigest()[:16]
                    ),
                }
            )

    return staged.mapInPandas(
        encode_batches,
        schema=(
            f"doc_id {id_type}, n_sym_chars bigint, "
            "n_tokens_bpe bigint, enc_digest string"
        ),
    )


def _t41_oracle(rounds: int = BPE_ROUNDS) -> str:
    """t40's unrolled training chain, extended with one MATERIALIZED
    doc-level CTE per round that replays the identical double-space
    merge algebra over every document's symbol string — the value
    hash pins training AND application, down to the md5 of each
    encoded document."""
    train = _t40_oracle(rounds)
    train_ctes = train[: train.rindex("SELECT CAST(round_id")]
    sym = (
        "array_to_string(list_transform("
        "  list_filter(string_split(lower(text), ' '), w -> w <> ''),"
        "  w -> array_to_string("
        "    list_filter(string_split(w, ''), x -> x <> ''), ' ')), "
        f"' {BPE_SEP} ')"
    )
    parts = [train_ctes]
    parts.append(f"""
    , docs0 AS MATERIALIZED (
      SELECT doc_id, {sym} AS s FROM documents
    )""")
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f"""
    , docs{r} AS MATERIALIZED (
      SELECT doc_id, trim(replace(replace(replace(' ' || s || ' ', ' ', '  '),
               (SELECT ' ' || lft || '  ' || rgt || ' ' FROM best{r}),
               (SELECT ' ' || lft || rgt || ' ' FROM best{r})),
             '  ', ' ')) AS s
      FROM docs{p}
    )""")
    count = (
        "CAST(len(list_filter(string_split({col}, ' '), "
        f"t -> t <> '' AND t <> '{BPE_SEP}')) AS BIGINT)"
    )
    parts.append(f"""
    SELECT d0.doc_id,
           {count.format(col='d0.s')} AS n_sym_chars,
           {count.format(col=f'd{rounds}.s')} AS n_tokens_bpe,
           substr(md5(d{rounds}.s), 1, 16) AS enc_digest
    FROM docs0 d0 JOIN docs{rounds} d{rounds} USING (doc_id)
""")
    return "".join(parts)


@register(
    "t41_bpe_encode",
    oracle=_t41_oracle(),
    tags=("text", "tokenizer", "bpe", "encode"),
)
def t41_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`bpe_encode` over the documents corpus: train {BPE_ROUNDS}
    merges (t40), then tokenize every document with them — the
    complete train→apply tokenizer lifecycle a data pipeline runs
    before packing (t29 consumes exactly these token counts at real
    scale). Per-document before/after symbol counts plus an encoded
    md5 slice make the oracle sensitive to any divergence in either
    phase; the encode itself is plan-pinned map-only (≤1 exchange:
    the fixture fan_out)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    return bpe_encode(docs)


# ---------------------------------------------------------------------------
# t42: pairwise source-overlap matrix — the mixture-design audit
# ---------------------------------------------------------------------------

OVERLAP_NGRAM = 3


def source_overlap_matrix(docs: DataFrame, n: int = OVERLAP_NGRAM) -> DataFrame:
    """Jaccard overlap between every pair of corpus SOURCES over
    distinct {n}-gram hashes — the audit run before designing a
    training mixture (t27 rebalances sources; this measures how
    redundant they are with each other first, t25/t37 generalized
    from corpus-vs-eval to all source pairs). 100 TB shape: the only
    corpus-sized object is the distinct (source, gram-hash) table —
    one gram-grain exchange — and the intersection self-join
    co-partitions on the hash, where each gram meets at most
    S·(S−1)/2 source pairs (S = #sources, a catalog-sized constant),
    so candidate volume is linear in distinct grams. The S×S result
    frame itself is built from a broadcast cross of the tiny source
    list, so zero-overlap pairs still emit (deterministic full
    matrix, COALESCE 0)."""
    gh = decontamination_gram_hashes(docs, n=n)
    sg = (
        gh.join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "h")
        .distinct()
    )
    sg = scoped_persist(sg)
    sizes = sg.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    inter = (
        sg.alias("a")
        .join(
            sg.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    srcs = sizes.select(F.col("source"), "n_grams")
    pairs = (
        srcs.select(
            F.col("source").alias("source_a"), F.col("n_grams").alias("n_grams_a")
        )
        .crossJoin(
            F.broadcast(
                srcs.select(
                    F.col("source").alias("source_b"),
                    F.col("n_grams").alias("n_grams_b"),
                )
            )
        )
        .where(F.col("source_a") < F.col("source_b"))
    )
    out = pairs.join(F.broadcast(inter), ["source_a", "source_b"], "left")
    nc = F.coalesce(F.col("n_common"), F.lit(0)).cast("bigint")
    return out.select(
        "source_a",
        "source_b",
        "n_grams_a",
        "n_grams_b",
        nc.alias("n_common"),
        F.round(
            nc * F.lit(1.0)
            / (F.col("n_grams_a") + F.col("n_grams_b") - nc),
            6,
        ).alias("jaccard"),
    )


@register(
    "t42_source_overlap",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS ws FROM documents
    ),
    g AS (
      SELECT doc_id, source, unnest(CASE WHEN len(ws) >= {OVERLAP_NGRAM} THEN
               [list_aggregate(ws[i : i + {OVERLAP_NGRAM - 1}], 'string_agg', ' ')
                for i in generate_series(1, len(ws) - {OVERLAP_NGRAM} + 1)]
             ELSE [] END) AS gram
      FROM w
    ),
    sg AS (
      SELECT DISTINCT source,
             ('0x' || substr(md5(gram), 1, 12))::BIGINT % 2147483647 AS h
      FROM g
    ),
    sizes AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams FROM sg GROUP BY 1
    ),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM sg a JOIN sg b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT sa.source AS source_a, sb.source AS source_b,
           sa.n_grams AS n_grams_a, sb.n_grams AS n_grams_b,
           CAST(COALESCE(i.n_common, 0) AS BIGINT) AS n_common,
           ROUND(COALESCE(i.n_common, 0) * 1.0 /
                 (sa.n_grams + sb.n_grams - COALESCE(i.n_common, 0)), 6) AS jaccard
    FROM sizes sa JOIN sizes sb ON sa.source < sb.source
    LEFT JOIN inter i ON i.source_a = sa.source AND i.source_b = sb.source
    """,
    tags=("text", "ngram", "overlap", "mixture"),
)
def t42_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`source_overlap_matrix` over the documents corpus: the full
    S×S/2 Jaccard matrix between sources on {OVERLAP_NGRAM}-gram
    hashes — which feeds duplicate each other and by how much, the
    question answered before t27's mixture weights are chosen.
    Zero-overlap pairs emit with jaccard 0 (full deterministic
    matrix). Oracle replays the identical md5-slice gram hashing and
    set algebra."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    return source_overlap_matrix(docs)


# ---------------------------------------------------------------------------
# t45: vocabulary-growth (Heaps'-law) audit — the corpus-composition
# curve a data pipeline reads before deciding whether more of the same
# source still buys new coverage
# ---------------------------------------------------------------------------

T45_DECILES = 10


@register(
    "t45_vocab_growth",
    oracle=f"""
    WITH nn AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
    d AS (
      SELECT doc_id,
             CAST(doc_id * {T45_DECILES} // nn.n AS INT) + 1 AS decile,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
      FROM documents, nn
    ),
    tok AS (SELECT decile, unnest(ts) AS tok FROM d),
    big AS (
      SELECT decile,
             unnest([ts[i] || ' ' || ts[i + 1]
                     for i in generate_series(1, len(ts) - 1)]) AS bg
      FROM d
    ),
    ft AS (SELECT tok, MIN(decile) AS first_dec FROM tok GROUP BY tok),
    fb AS (SELECT bg, MIN(decile) AS first_dec FROM big GROUP BY bg),
    nv AS (SELECT first_dec AS decile, COUNT(*) AS vocab_new FROM ft GROUP BY 1),
    nb AS (SELECT first_dec AS decile, COUNT(*) AS bigram_new FROM fb GROUP BY 1),
    tc AS (SELECT decile, COUNT(*) AS toks FROM tok GROUP BY 1),
    dc AS (SELECT decile, COUNT(*) AS docs FROM d GROUP BY 1)
    SELECT dc.decile AS decile,
           CAST(SUM(dc.docs) OVER w AS BIGINT) AS docs_cum,
           CAST(SUM(COALESCE(tc.toks, 0)) OVER w AS BIGINT) AS tokens_cum,
           CAST(SUM(COALESCE(nv.vocab_new, 0)) OVER w AS BIGINT) AS vocab_cum,
           CAST(SUM(COALESCE(nb.bigram_new, 0)) OVER w AS BIGINT) AS bigram_vocab_cum
    FROM dc
    LEFT JOIN tc ON tc.decile = dc.decile
    LEFT JOIN nv ON nv.decile = dc.decile
    LEFT JOIN nb ON nb.decile = dc.decile
    WINDOW w AS (ORDER BY dc.decile ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    ORDER BY decile
    """,
    tags=("text", "corpus_stats", "vocabulary", "heaps_law"),
)
def t45_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: cut the corpus into {10} deciles
    by ingestion order (doc_id), and report CUMULATIVE docs, tokens,
    distinct unigram vocabulary and distinct bigram vocabulary at each
    decile boundary — new vocabulary attributed to the decile where
    the term FIRST appears. A flattening curve says another unit of
    this source buys repetition, not coverage (t37's batch novelty
    generalized to the whole-corpus growth trajectory).

    Scale shape: two explodes (token and bigram grain — the bigram
    list is a map-only array `transform`, no positional self-join),
    each followed by a map-side-combined min/count hash aggregate to
    the DISTINCT-TERM grain; the decile roll-ups are ≤{10}-row tables
    and the cumulative window orders {10} rows on one partition —
    driver-bounded by construction. The decile cut is integer
    arithmetic (doc_id·10 div N) on BOTH engines, so no float
    boundary can move a document between buckets."""
    docs = table(spark, sf_dir, "documents")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    dec = (F.expr(f"doc_id * {T45_DECILES} DIV {n}") + 1).cast("int")
    base = scoped_persist(
        docs.select(
            dec.alias("decile"),
            F.filter(tokens_col(F.col("text")), lambda x: x != "").alias("ts"),
        )
    )
    tok = base.select("decile", F.explode("ts").alias("tok"))
    big = base.select(
        "decile",
        F.explode(
            F.expr(
                # greatest(..., 0): slice length -1 on a zero-token doc
                # raises INVALID_PARAMETER_VALUE; the oracle's
                # generate_series(1, -1) yields an empty list instead
                "transform(slice(ts, 1, greatest(size(ts) - 1, 0)), "
                "(x, i) -> concat(x, ' ', ts[i + 1]))"
            )
        ).alias("bg"),
    )
    nv = (
        tok.groupBy("tok")
        .agg(F.min("decile").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("vocab_new"))
    )
    nb = (
        big.groupBy("bg")
        .agg(F.min("decile").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("bigram_new"))
    )
    tc = tok.groupBy("decile").agg(F.count(F.lit(1)).alias("toks"))
    dc = base.groupBy("decile").agg(F.count(F.lit(1)).alias("docs"))
    from pyspark.sql import Window as W

    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        dc.join(tc, "decile", "left")
        .join(nv, "decile", "left")
        .join(nb, "decile", "left")
        .select(
            "decile",
            F.sum("docs").over(w).cast("bigint").alias("docs_cum"),
            F.sum(F.coalesce(F.col("toks"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("tokens_cum"),
            F.sum(F.coalesce(F.col("vocab_new"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("vocab_cum"),
            F.sum(F.coalesce(F.col("bigram_new"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("bigram_vocab_cum"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# t49: PII detection / redaction (VERDICT r10 #4 — the one standard
# LLM-pipeline stage the suite lacked; completes the preprocessing set
# alongside dedup / quality / decontamination / mixture. The reference
# user would write this as a map closure, Worker.fs:20.)
#
# Pattern notes: every pattern is deliberately restricted to syntax
# with IDENTICAL semantics in Java regex (Spark) and RE2 (DuckDB) —
# character classes, bounded repetition, \d, \b word boundaries; no
# backreferences, no lookaround (RE2 has neither).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"      # 3-2-4: disjoint from phone's 3-3-4
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# Redaction applies in a FIXED sequence (email → ssn → phone → ipv4) on
# both engines, so any theoretical pattern interplay is replayed
# identically; with these shapes the four pattern families are in fact
# mutually non-overlapping (tested on planted fixtures).
PII_REDACTIONS = (
    (PII_EMAIL, "<EMAIL>"),
    (PII_SSN, "<ID>"),
    (PII_PHONE, "<PHONE>"),
    (PII_IPV4, "<IP>"),
)


def _pii_aug_sql() -> str:
    """The deterministic PII-planting expression, SQL side — shared
    by the t49 oracle and the st22 streaming-audit oracle so the two
    cannot drift (Spark twin: ``pii_plant_expr``)."""
    return (
        "text"
        " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' ||"
        " CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 3 THEN ' call 555-' ||"
        " lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||"
        " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
        " || CASE WHEN doc_id % 11 = 2 THEN ' from 10.' ||"
        " CAST(doc_id % 256 AS VARCHAR) || '.' ||"
        " CAST((doc_id * 7) % 256 AS VARCHAR) || '.' ||"
        " CAST((doc_id * 13) % 256 AS VARCHAR) ELSE '' END"
        " || CASE WHEN doc_id % 13 = 4 THEN ' id ' ||"
        " lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||"
        " lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' ||"
        " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    )


def _t49_oracle() -> str:
    """DuckDB twin. The fixture corpus is a PII-free word grammar, so
    the query PLANTS deterministic PII derived from doc_id (pure SQL
    string algebra, identical on both engines) before detecting — the
    detection/redaction machinery is exercised non-vacuously at every
    SF instead of hashing an all-zero report."""
    aug = _pii_aug_sql()
    redacted = "aug"
    for pat, tok in PII_REDACTIONS:
        redacted = (
            "regexp_replace(" + redacted + ", '" + pat + "', '" + tok + "', 'g')"
        )
    counts = ", ".join(
        "CAST(len(regexp_extract_all(aug, '" + pat + "')) AS BIGINT) AS " + name
        for name, pat in (
            ("n_email", PII_EMAIL),
            ("n_phone", PII_PHONE),
            ("n_ipv4", PII_IPV4),
            ("n_ssn", PII_SSN),
        )
    )
    return (
        "WITH aug_t AS (SELECT doc_id, " + aug + " AS aug FROM documents), "
        "det AS (SELECT doc_id, " + counts + ", " + redacted
        + " AS redacted FROM aug_t) "
        "SELECT doc_id, n_email, n_phone, n_ipv4, n_ssn, redacted FROM det "
        "WHERE n_email + n_phone + n_ipv4 + n_ssn > 0"
    )


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Library entry: per-document PII match counts + redacted text
    over an arbitrary corpus (no planting — that is t49's fixture
    story). Pure-expression regex work: detection via
    regexp_extract_all + size, redaction via a chained regexp_replace
    — a map-only projection, whole-stage-codegen eligible like t18's
    cleaner, zero exchanges at any corpus size."""
    c = F.col(text_col)
    out = docs.withColumn("n_email", F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), F.lit(0))).cast("bigint"))
    out = out.withColumn("n_phone", F.size(F.regexp_extract_all(c, F.lit(PII_PHONE), F.lit(0))).cast("bigint"))
    out = out.withColumn("n_ipv4", F.size(F.regexp_extract_all(c, F.lit(PII_IPV4), F.lit(0))).cast("bigint"))
    out = out.withColumn("n_ssn", F.size(F.regexp_extract_all(c, F.lit(PII_SSN), F.lit(0))).cast("bigint"))
    red = c
    for pat, tok in PII_REDACTIONS:
        red = F.regexp_replace(red, pat, tok)
    return out.withColumn("redacted", red)


def pii_plant_expr() -> Column:
    """The deterministic PII-planting expression, Spark side — shared
    by t49 and the st22 streaming audit (SQL twin: ``_pii_aug_sql``)."""
    d = F.col("doc_id")

    def pad(expr: Column, n: int) -> Column:
        return F.lpad(expr.cast("string"), n, "0")

    return F.concat(
        F.col("text"),
        F.when(
            d % 7 == 0,
            F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 3,
            F.concat(F.lit(" call 555-"), pad(d % 1000, 3), F.lit("-"), pad(d % 10000, 4)),
        ).otherwise(F.lit("")),
        F.when(
            d % 11 == 2,
            F.concat(
                F.lit(" from 10."),
                (d % 256).cast("string"),
                F.lit("."),
                ((d * 7) % 256).cast("string"),
                F.lit("."),
                ((d * 13) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 13 == 4,
            F.concat(
                F.lit(" id "), pad(d % 1000, 3), F.lit("-"), pad(d % 100, 2),
                F.lit("-"), pad(d % 10000, 4),
            ),
        ).otherwise(F.lit("")),
    )


@register(
    "t49_pii_redact",
    oracle=_t49_oracle(),
    tags=("text", "pii", "map-only"),
)
def t49_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — emails, phone shapes, IPv4
    literals, SSN-shaped ids — emitting per-document match counts and
    the redacted text (both value-hash-checked against DuckDB's
    regexp engine, not just counts).

    The fixture corpus is a PII-free word grammar, so the registered
    query first PLANTS deterministic PII derived from doc_id (pure
    string algebra replayed identically by the oracle); the library
    entry ``pii_redact`` is the production surface and plants
    nothing. Plan shape at 100 TB: one map-only projection + filter —
    no exchange, no state; survivors stream straight into the t18 /
    t20 cleaning funnel. Reference parity: a user would express this
    as a map closure over the corpus (Worker.fs:20,75-87)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    det = pii_redact(docs.select("doc_id", pii_plant_expr().alias("text")))
    return det.select(
        "doc_id", "n_email", "n_phone", "n_ipv4", "n_ssn", "redacted"
    ).where(
        (F.col("n_email") + F.col("n_phone") + F.col("n_ipv4") + F.col("n_ssn")) > 0
    )


# --- t50: bigram-LM perplexity scoring (CCNet-style quality filter) ---
#
# The standard LM-based quality stage a corpus run applies alongside
# the heuristic lenses (t06/t20/t21): train an add-one-smoothed bigram
# model ON the corpus itself and score every document's per-bigram
# cross-entropy — fluent/boilerplate text scores low, token soup
# scores high. Float discipline: each bigram's log-probability is
# rounded ONCE into a scaled BIGINT (floor(ln(p)*1e6 + 0.5) — the
# explicit-floor form so both engines round halves identically), the
# per-doc reduction is an exact integer sum (no float-accumulation
# order dependence across partitions), and the final cross-entropy is
# one IEEE division of identical integers on both engines.
LM_SCALE = 1_000_000
LN2_LIT = "0.6931471805599453"
# broadcast the (w1,w2,c12) model when it is vocab-bounded small; at
# web scale (billions of distinct bigrams) fall back to a shuffle join
LM_BROADCAST_CAP = 4_000_000


def _t50_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    big AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM toks, LATERAL UNNEST(range(1, len(t))) AS r(i)
      WHERE len(t) >= 2
    ),
    lm AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2),
    ctx AS (SELECT w1, SUM(c12) AS c1 FROM lm GROUP BY 1),
    vocab AS (
      SELECT COUNT(DISTINCT w2) AS v
      FROM (SELECT w1 AS w2 FROM big UNION ALL SELECT w2 FROM big)
    ),
    scored AS (
      SELECT b.doc_id,
             CAST(FLOOR(LN((lm.c12 + 1.0) / (ctx.c1 + vocab.v))
                        * {LM_SCALE} + 0.5) AS BIGINT) AS lp
      FROM big b
      JOIN lm ON b.w1 = lm.w1 AND b.w2 = lm.w2
      JOIN ctx ON b.w1 = ctx.w1
      CROSS JOIN vocab
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lp) AS BIGINT) AS sum_logp_scaled,
           ROUND(-SUM(lp) / (COUNT(*) * {LM_SCALE}.0 * {LN2_LIT}), 4)
             AS cross_entropy
    FROM scored GROUP BY doc_id
    """


def bigram_lm_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Score each document's cross-entropy (bits per bigram) under an
    add-one-smoothed bigram LM trained on the corpus itself.

    100 TB shape: ONE corpus-mass exchange builds the (w1, w2, c12)
    model (map-side combined); the context totals and vocabulary size
    are re-aggregations of that vocab²-bounded table, not of the
    corpus. Scoring explodes bigrams map-side, meets the model via a
    BROADCAST join while it fits (LM_BROADCAST_CAP; shuffle join with
    AQE beyond), and reduces per doc with map-side partial aggregation
    — two corpus-mass exchanges total, both keyed and combinable.
    Reference parity: map + keyed reduce (Worker.fs:20,89-96)."""
    toks = docs.select(
        "doc_id", tokens_col(F.col(text_col)).alias("t")
    ).where(F.size("t") >= 2)
    big = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.size("t") - 1).alias("w1"),
                F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))

    lm = scoped_persist(big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")))
    n_lm = lm.count()  # vocab²-bounded; also materializes the persist
    ctx = lm.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = (
        lm.select(F.col("w1").alias("w"))
        .unionAll(lm.select(F.col("w2").alias("w")))
        .agg(F.countDistinct("w").alias("v"))
        .collect()[0][0]
    )  # one scalar to the driver — the vocabulary size, not data

    join_lm = F.broadcast(lm) if n_lm <= LM_BROADCAST_CAP else lm
    join_ctx = F.broadcast(ctx) if n_lm <= LM_BROADCAST_CAP else ctx
    scored = (
        big.join(join_lm, ["w1", "w2"])
        .join(join_ctx, ["w1"])
        .select(
            "doc_id",
            F.floor(
                F.ln(
                    (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.lit(float(v)))
                )
                * LM_SCALE
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("lp").cast("bigint").alias("sum_logp_scaled"),
        F.round(
            -F.sum("lp")
            / (F.count(F.lit(1)) * F.lit(float(LM_SCALE)) * F.expr(LN2_LIT)),
            4,
        ).alias("cross_entropy"),
    )


@register(
    "t50_bigram_perplexity",
    oracle=_t50_oracle(),
    tags=("text", "quality", "lm"),
)
def t50_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based quality scoring — the LM lens the heuristic
    quality stack (t06/t20/t21) lacks: per-document cross-entropy in
    bits per bigram under a corpus-trained add-one bigram model, with
    the exact integer log-mass alongside so downstream mixture /
    filtering stages can re-threshold without re-scoring. Every value
    (including the float) is hash-checked against DuckDB replaying the
    identical model fit. Reference parity: a user would express the
    model build and the scoring as two map+reduce passes
    (Worker.fs:20,89-96; Example-Job.fs:57-61 for the frequency
    count)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    return bigram_lm_score(docs)


# ---------------------------------------------------------------------------
# t51: multinomial Naive-Bayes classifier — the LEARNED filter that
# completes the quality/filtering stack. Everything before it is a
# fixed rule (t06/t20/t21 heuristics, t05's stopword language-ID,
# t50's LM lens); production corpus pipelines (the CCNet /
# fastText-filter precedent) additionally TRAIN a classifier on
# labeled data and apply it corpus-wide. The machinery below is that
# stage end-to-end on Spark: a distributive model fit (hash
# aggregations), a broadcast-joined map-only scorer, and a
# deterministic argmax — demonstrated on the `lang` label (the same
# code is the quality filter when the label is wiki-vs-crawl).
# Log-probabilities use t50's integer-scaling discipline (floor(ln·1e6
# + 0.5) summed exactly as BIGINT) so DuckDB replays the identical
# fit and scores bit-for-bit.

NB_SCALE = 1_000_000
# broadcast the (class, token) model while it is vocab-bounded small;
# at web scale fall back to a shuffle join on the token key
NB_BROADCAST_CAP = 4_000_000


def _t51_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    cls AS (
      SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1
    ),
    pri AS (
      SELECT c, CAST(FLOOR(LN(CAST(n_docs AS DOUBLE)
                              / CAST(SUM(n_docs) OVER () AS DOUBLE))
                           * {NB_SCALE} + 0.5) AS BIGINT) AS prior_scaled
      FROM cls
    ),
    cnt AS (
      SELECT lang AS c, w, CAST(COUNT(*) AS BIGINT) AS m
      FROM toks GROUP BY 1, 2
    ),
    tot AS (SELECT c, CAST(SUM(m) AS BIGINT) AS t FROM cnt GROUP BY 1),
    vocab AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM cnt),
    probe AS (
      SELECT tk.doc_id, tk.lang, cl.c, tk.w
      FROM toks tk CROSS JOIN (SELECT c FROM cls) cl
    ),
    lp AS (
      SELECT p.doc_id, p.lang, p.c,
             CAST(FLOOR(LN((COALESCE(cnt.m, 0) + 1.0)
                           / CAST(tot.t + vocab.v AS DOUBLE))
                        * {NB_SCALE} + 0.5) AS BIGINT) AS lp
      FROM probe p
      LEFT JOIN cnt ON p.c = cnt.c AND p.w = cnt.w
      JOIN tot ON p.c = tot.c
      CROSS JOIN vocab
    ),
    per_class AS (
      SELECT l.doc_id, l.lang, l.c,
             CAST(SUM(l.lp) AS BIGINT) + pri.prior_scaled AS score_scaled
      FROM lp l JOIN pri ON l.c = pri.c
      GROUP BY l.doc_id, l.lang, l.c, pri.prior_scaled
    ),
    ranked AS (
      SELECT doc_id, lang, c, score_scaled,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score_scaled DESC, c) AS rn,
             score_scaled
               - LEAD(score_scaled) OVER (PARTITION BY doc_id
                                          ORDER BY score_scaled DESC, c)
               AS margin
      FROM per_class
    )
    SELECT doc_id, lang, c AS pred_lang, score_scaled,
           CAST(COALESCE(margin, 0) AS BIGINT) AS margin_scaled,
           (c = lang) AS is_correct
    FROM ranked WHERE rn = 1
    """


def nb_classify(
    docs: DataFrame, text_col: str = "text", label_col: str = "lang"
) -> DataFrame:
    """Train an add-one-smoothed multinomial Naive-Bayes classifier on
    the labeled corpus and score every document, emitting the argmax
    class, its integer-scaled log-posterior, the margin over the
    runner-up (so downstream stages re-threshold without re-scoring),
    and the self-classification flag.

    100 TB shape: the fit is ONE corpus-mass exchange (the (class,
    token) hash aggregation, map-side combined); the per-class totals,
    priors, and vocabulary size are re-aggregations of that
    vocab×classes-bounded model table, not of the corpus. Scoring
    explodes tokens map-side, fans each across the class list (a
    class-cardinality broadcast, ×2 for a binary quality filter),
    meets the model via a BROADCAST join while it fits
    (NB_BROADCAST_CAP; shuffle join with AQE beyond), and reduces per
    (doc, class) with map-side partial aggregation — the second and
    last corpus-mass exchange. The argmax window runs over docs ×
    classes skinny rows. Reference parity: a reference user would
    write the fit and the scorer as two map+keyed-reduce jobs
    (Worker.fs:20,89-96)."""
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id",
        F.col(label_col).alias("lang"),
        F.explode(tokens_col(F.col(text_col))).alias("w"),
    )
    cls = scoped_persist(
        docs.groupBy(F.col(label_col).alias("c")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs")
        )
    )
    pri = cls.crossJoin(
        cls.agg(F.sum("n_docs").cast("bigint").alias("n_all"))
    ).select(
        "c",
        F.floor(
            F.ln(F.col("n_docs").cast("double") / F.col("n_all").cast("double"))
            * NB_SCALE
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("prior_scaled"),
    )

    cnt = scoped_persist(
        toks.groupBy(F.col("lang").alias("c"), "w").agg(
            F.count(F.lit(1)).cast("bigint").alias("m")
        )
    )
    # model size (broadcast decision) and vocabulary size (distinct w
    # over (c, w) ≡ distinct w over the corpus) in ONE model-sized
    # job — it also materializes the persist
    n_model, v = cnt.agg(
        F.count(F.lit(1)), F.count_distinct("w")
    ).collect()[0]
    tot = cnt.groupBy("c").agg(F.sum("m").cast("bigint").alias("t"))

    join_cnt = F.broadcast(cnt) if n_model <= NB_BROADCAST_CAP else cnt
    join_tot = F.broadcast(tot)
    scored = (
        toks.crossJoin(F.broadcast(cls.select("c")))
        .join(join_cnt, ["c", "w"], "left")
        .join(join_tot, ["c"])
        .select(
            "doc_id",
            "lang",
            "c",
            F.floor(
                F.ln(
                    (F.coalesce(F.col("m"), F.lit(0)) + F.lit(1.0))
                    / (F.col("t") + F.lit(int(v))).cast("double")
                )
                * NB_SCALE
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lp"),
        )
    )
    per_class = (
        scored.groupBy("doc_id", "lang", "c")
        .agg(F.sum("lp").cast("bigint").alias("sum_lp"))
        .join(F.broadcast(pri), ["c"])
        .select(
            "doc_id",
            "lang",
            "c",
            (F.col("sum_lp") + F.col("prior_scaled")).alias("score_scaled"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("score_scaled"), F.asc("c")
    )
    ranked = per_class.select(
        "doc_id",
        "lang",
        "c",
        "score_scaled",
        F.row_number().over(win).alias("rn"),
        F.coalesce(
            F.col("score_scaled") - F.lead("score_scaled").over(win), F.lit(0)
        )
        .cast("bigint")
        .alias("margin_scaled"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "doc_id",
        "lang",
        F.col("c").alias("pred_lang"),
        "score_scaled",
        "margin_scaled",
        (F.col("c") == F.col("lang")).alias("is_correct"),
    )


@register(
    "t51_nb_classifier",
    oracle=_t51_oracle(),
    tags=("text", "quality", "classifier", "learned"),
)
def t51_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned corpus filter: train multinomial NB on the `lang` label
    and classify every document (see ``nb_classify``). Every column —
    the prediction, the exact integer log-posterior, the runner-up
    margin, and the correctness flag — is value-hash-checked against
    DuckDB replaying the identical fit, smoothing, and tie-break."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    return nb_classify(docs)

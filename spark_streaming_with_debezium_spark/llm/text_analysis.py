"""Text analysis for training-data pipelines (north star).

Language-ID (stopword-overlap heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and document fingerprinting
(min-hash over character shingles — a rolling-hash analog).

All pure built-in expressions (regexp/array higher-order functions) —
per-row, embarrassingly parallel, no shuffle except final aggregates;
the exact shape that scales linearly to 100 TB. Regexes stick to
portable character classes so the Java (Spark) and RE2-ish (DuckDB)
engines agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.functions.numeric import davg, sql_davg
from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table

#: Tiny per-language stopword lists for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ein"),
}

_BPE_ISH = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"


def _words(c: Column) -> Column:
    return F.split(F.lower(F.trim(c)), "\\s+")


@query(
    "text_token_counts",
    oracle=f"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{_BPE_ISH}')) AS n_bpe_tokens,
           length(text) AS n_chars_measured
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer
    (letters runs / single digits / single punctuation — the GPT-2
    pre-tokenizer shape without unicode categories)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), "\\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_ISH), 0)).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


@query(
    "text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, text,
             string_split_regex(lower(trim(text)), '\\s+') AS words
      FROM documents
    )
    SELECT doc_id, lang,
           len(words) AS n_words,
           round(CAST(length(text) AS DOUBLE) / len(words), 6) AS avg_word_len,
           round(CAST(len(list_filter(words,
                 w -> list_contains(['the','a','and','of','to'], w)))
             AS DOUBLE) / len(words), 6) AS stopword_ratio,
           round(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
             / length(text), 6) AS punct_ratio,
           (len(words) BETWEEN 5 AND 1000) AND
             (CAST(length(text) AS DOUBLE) / len(words)) BETWEEN 3 AND 12
             AS passes_quality
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: word counts, average word length, stopword
    ratio, punctuation ratio, and a composite pass/fail gate — the
    C4/Gopher-style heuristic filter family."""
    d = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_words = F.size(words)
    awl = F.length("text").cast("double") / n_words
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(*STOPWORDS["en"]))
    )
    punct = F.size(F.regexp_extract_all("text", F.lit("[^a-zA-Z0-9 ]"), 0))
    return d.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        F.round(awl, 6).alias("avg_word_len"),
        F.round(stop_hits.cast("double") / n_words, 6).alias("stopword_ratio"),
        F.round(punct.cast("double") / F.length("text"), 6).alias("punct_ratio"),
        (n_words.between(5, 1000) & awl.between(3, 12)).alias("passes_quality"),
    )


def _lang_score(words: Column, lang: str) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*STOPWORDS[lang])))


@query(
    "text_langid",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang AS labeled_lang,
             string_split_regex(lower(trim(text)), '\\s+') AS words
      FROM documents
    ),
    scored AS (
      SELECT doc_id, labeled_lang,
             len(list_filter(words, w -> list_contains(['the','a','and','of','to'], w))) AS s_en,
             len(list_filter(words, w -> list_contains(['el','la','de','que','y'], w))) AS s_es,
             len(list_filter(words, w -> list_contains(['der','die','und','das','ein'], w))) AS s_de
      FROM t
    )
    SELECT doc_id, labeled_lang,
           CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
                WHEN s_es >= s_de THEN 'es'
                ELSE 'de' END AS detected_lang,
           s_en, s_es, s_de
    FROM scored
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-overlap votes per language,
    deterministic argmax (en > es > de tie order)."""
    d = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    s_en, s_es, s_de = (
        _lang_score(words, "en"),
        _lang_score(words, "es"),
        _lang_score(words, "de"),
    )
    detected = (
        F.when((s_en >= s_es) & (s_en >= s_de), "en")
        .when(s_es >= s_de, "es")
        .otherwise("de")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        detected.alias("detected_lang"),
        s_en.alias("s_en"),
        s_es.alias("s_es"),
        s_de.alias("s_de"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_min(list_transform(
             range(1, greatest(length(text) - 19, 1) + 1),
             i -> md5(substr(text, CAST(i AS INT), 20)))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: minimum md5 over all 20-char shingles — a
    winnowing/rolling-hash analog with an exact SQL oracle. Robust to
    edits outside the minimizing shingle; per-row only."""
    d = load_table(spark, sf_dir, "documents")
    positions = F.sequence(F.lit(1), F.greatest(F.length("text") - 19, F.lit(1)))
    fp = F.array_min(
        F.transform(positions, lambda i: F.md5(F.substr(F.col("text"), i, F.lit(20))))
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@query(
    "text_corpus_stats",
    oracle=f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           {sql_davg('n_chars')} AS avg_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def text_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus facet stats: per (lang, source) doc counts + char-length
    distribution — the dataset-card summary query."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg("n_chars").alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "text_redact",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[a-zA-Z0-9.]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
             '[0-9]{4,}', '<NUM>', 'g') AS redacted,
           len(regexp_extract_all(text, '[0-9]{4,}')) AS n_long_numbers
    FROM documents
    """,
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing: redact email-shaped tokens and long digit
    runs (the pattern family; real PII scrubbing swaps in its own
    regexes). Pure regexp_replace — per-row, codegen'd."""
    d = load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace("text", "[a-zA-Z0-9.]+@[a-zA-Z0-9.]+", "<EMAIL>"),
        "[0-9]{4,}",
        "<NUM>",
    )
    return d.select(
        "doc_id",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]{4,}"), 0)).alias(
            "n_long_numbers"
        ),
    )


@query(
    "text_repetition",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS words
      FROM documents
    )
    SELECT doc_id,
           len(words) AS n_words,
           len(list_distinct(words)) AS n_distinct,
           round(1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / len(words), 6)
             AS repetition_ratio
    FROM sh
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (C4/Gopher-style gate): 1 − distinct
    words / total words. High values flag boilerplate/spam docs."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim("text")), "\\s+")
    n = F.size(words)
    nd = F.size(F.array_distinct(words))
    return d.select(
        "doc_id",
        n.alias("n_words"),
        nd.alias("n_distinct"),
        F.round(F.lit(1.0) - nd.cast("double") / n, 6).alias("repetition_ratio"),
    )


@query(
    "text_token_rarity",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
      FROM documents
    ),
    freq AS (SELECT word, COUNT(*) AS wc FROM words GROUP BY word),
    tot AS (SELECT COUNT(*) AS n FROM words)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           round(CAST(SUM(CAST(CAST(n AS DOUBLE) / wc AS DECIMAL(38,6)))
                      AS DOUBLE) / COUNT(*), 4) AS mean_rarity
    FROM words JOIN freq USING (word), tot
    GROUP BY doc_id
    """,
)
def text_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-frequency quality signal: mean token rarity (corpus
    tokens ÷ word count) per document — high values flag documents of
    unusual vocabulary, the same ranking role as a unigram logprob but
    built from integer ratios so the oracle comparison is
    transcendental-free (ln() can differ by 1 ulp between libm
    implementations; n/wc cannot). Two aggregates + one shuffle join on
    word; the corpus-total is a broadcast 1-row cross join. At 100 TB
    the word join is Zipf-skewed (stopwords) — AQE skew-join splitting
    (on in the session factory) handles it, or broadcast `freq` when
    the vocabulary is bounded."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("word")
    )
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    tot = F.broadcast(words.agg(F.count(F.lit(1)).alias("n")))
    rarity = (F.col("n").cast("double") / F.col("wc")).cast("decimal(38,6)")
    return (
        words.join(freq, "word")
        .crossJoin(tot)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(rarity).cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_rarity"),
        )
    )


@query(
    "text_bigram_predictability",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    bg AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      FROM toks, UNNEST(range(1, len(w))) AS t(i)
    ),
    bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
    uc AS (SELECT w1, SUM(cb) AS cu FROM bc GROUP BY 1)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           round(CAST(SUM(CAST(CAST(cb AS DOUBLE) / cu AS DECIMAL(38,6)))
                      AS DOUBLE) / COUNT(*), 4) AS mean_predictability
    FROM bg JOIN bc USING (w1, w2) JOIN uc USING (w1)
    GROUP BY doc_id
    """,
)
def text_bigram_predictability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality signal: per document, the mean conditional
    probability p(w2|w1) = c(w1,w2)/c(w1·) under the corpus's own MLE
    bigram model — the KenLM-perplexity ranking role (boilerplate and
    templated text score high, unusual word sequences low), built from
    integer count ratios so the oracle comparison is
    transcendental-free (same discipline as ``text_token_rarity``: a
    log-prob formulation would hinge on ln() agreeing to the last ulp
    across libm implementations).

    Shape: per-doc bigrams via a guarded index transform
    (sequence(1,0) counts DOWN — short docs need an empty array);
    unigram-left counts derived FROM the bigram counts (one fewer
    consumer of the exploded lineage); two count aggregates + the
    scoring join + the per-doc aggregate. The w1 join is Zipf-skewed at
    100 TB — AQE skew splitting handles it, or broadcast ``uc``/``bc``
    when the vocabulary is bounded."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _words(F.col("text")).alias("w"))
    pair_idx = F.when(
        F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bg = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                pair_idx,
                lambda i: F.struct(
                    F.element_at("w", i).alias("w1"),
                    F.element_at("w", i + F.lit(1)).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    uc = bc.groupBy("w1").agg(F.sum("cb").alias("cu"))
    pred = (F.col("cb").cast("double") / F.col("cu")).cast("decimal(38,6)")
    return (
        bg.join(bc, ["w1", "w2"])
        .join(uc, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(pred).cast("double") / F.count(F.lit(1)), 4).alias(
                "mean_predictability"
            ),
        )
    )


@query(
    "text_similar_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lower(trim(text)) AS norm,
             string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct([array_to_string(w[i:i+2], ' ')
                                      FOR i IN range(1, len(w) - 3 + 2)])
                  ELSE [norm] END AS s
      FROM toks
    ),
    scored AS (
      SELECT q.doc_id AS query_doc, c.doc_id AS match_doc,
             CAST(len(list_intersect(q.s, c.s)) AS DOUBLE)
               / (len(q.s) + len(c.s) - len(list_intersect(q.s, c.s))) AS jac
      FROM sh q JOIN sh c ON q.doc_id < 3 AND c.doc_id <> q.doc_id
    ),
    ranked AS (
      SELECT query_doc, match_doc, jac, ROW_NUMBER() OVER (
        PARTITION BY query_doc ORDER BY jac DESC, match_doc) AS rnk
      FROM scored
    )
    SELECT query_doc, match_doc, round(jac, 6) AS jaccard, rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def text_similar_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text-similarity retrieval: top-5 most shingle-Jaccard-
    similar corpus docs for each standing query doc (doc_id < 3) — the
    text twin of ``ann_cosine_topk`` and the exact baseline the LSH
    candidate generators approximate. Query shingle sets broadcast;
    the corpus is scanned once with no shuffle before the per-query
    top-k window (only q·n scalar score rows move, never the shingle
    arrays). Ranking keys are IEEE-exact integer-ratio doubles with a
    doc_id tie-break, so both engines rank identically. The oracle
    mirrors ``shingle_set`` exactly, including the whole-text fallback
    for docs shorter than one 3-word shingle."""
    from spark_streaming_with_debezium_spark.llm.dedup import shingle_set
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", shingle_set(F.col("text")).alias("s"))
    q = F.broadcast(
        sh.filter(F.col("doc_id") < 3).select(
            F.col("doc_id").alias("query_doc"), F.col("s").alias("qs")
        )
    )
    inter = F.size(F.array_intersect(F.col("qs"), F.col("s")))
    union = F.size("qs") + F.size("s") - inter
    scored = (
        sh.join(q, F.col("doc_id") != F.col("query_doc"))
        .withColumn("jac", inter.cast("double") / union)
        .select("query_doc", F.col("doc_id").alias("match_doc"), "jac")
    )
    w = Window.partitionBy("query_doc").orderBy(
        F.col("jac").desc(), F.col("match_doc")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_doc", "match_doc", F.round("jac", 6).alias("jaccard"), "rnk")
    )


#: Fixed keyword query for the BM25 demo — common corpus words so tf,
#: df, and the length normalization all do real work.
BM25_TERMS = ("table", "spark", "merge", "window")


@query(
    "text_bm25_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(len(w)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM toks
    ), tf AS (
      SELECT doc_id, len(w) AS dl, t.tok, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks, UNNEST(w) AS t(tok)
      WHERE t.tok IN ('table', 'spark', 'merge', 'window')
      GROUP BY 1, 2, 3
    ), df AS (
      SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT tf.doc_id,
             CAST(SUM(CAST(
               ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * (CAST(tf.dl AS DOUBLE) / s.avgdl))))
               AS DECIMAL(38,12))) AS DOUBLE) AS score
      FROM tf JOIN df ON tf.tok = df.tok, stats s
      GROUP BY 1
    )
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id
    LIMIT 10
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (k1=1.2, b=0.75): the lexical scorer that
    complements the embedding (``ann_*``) and shingle-Jaccard
    (``text_similar_topk``) retrieval faces — the trio is the standard
    hybrid-retrieval stack for corpus search and hard-negative mining.

    Determinism: tf, df, dl, and avgdl are exact integer ratios, so
    both engines feed IDENTICAL doubles into identical expression
    trees; the 4 idf ln() calls see the same 4 inputs everywhere. The
    per-term partial scores accumulate in DECIMAL before the final
    double conversion (order-independent, like every other float
    aggregate in this engine), and top-k orders by (rounded score,
    doc_id) so ranking is total.

    Scale shape: two scans of documents (corpus stats; tokenize+match),
    with dl carried THROUGH the explode so no third scan or join
    re-derives document lengths, and df computed as a window count
    OVER the tf frame (a per-term exchange on a tiny frame) rather
    than a second aggregation consumer, which would re-derive the
    whole tokenize lineage — plan-asserted ≤2 scans in
    tests/test_plans.py. The stats row broadcasts; the only data-sized
    shuffle is the (doc_id, term) tf groupBy on a uniform key. Top-k
    plans as TakeOrderedAndProject."""
    scored = _bm25_scored(load_table(spark, sf_dir, "documents"))
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


def _bm25_scored(d: DataFrame) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) scores over ``BM25_TERMS`` — the shared
    scorer of ``text_bm25_topk`` and ``retrieval_rrf_hybrid``. Returns
    (doc_id, score) for docs matching at least one term; see
    text_bm25_topk's docstring for the determinism + plan-shape
    rationale."""
    toks = d.select(
        "doc_id", F.split(F.lower(F.trim("text")), "\\s+").alias("w")
    )
    stats = F.broadcast(
        toks.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            (
                F.sum(F.size("w")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avgdl"),
        )
    )
    tf = (
        toks.select("doc_id", F.size("w").alias("dl"), F.explode("w").alias("tok"))
        .filter(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    # df per term via groupBy + BROADCAST join, not a window over tok:
    # with 4 query terms, a tok-partitioned window (or a shuffle join
    # on tok) funnels every tf row through 4 tasks — a single-reducer
    # gather per term at corpus scale. The broadcast join leaves tf
    # unshuffled; its price is one extra corpus scan for the tiny
    # (≤ |terms| rows) df aggregate, which parallelizes
    # embarrassingly, while the gather does not. (Exchange reuse
    # cannot collapse the two tf subtrees: column pruning legitimately
    # rewrites the df side's inner aggregate.)
    dfc = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    j = tf.join(F.broadcast(dfc), "tok").crossJoin(stats)
    idf = F.log(
        F.lit(1) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = idf * (
        F.col("tf")
        / (
            F.col("tf")
            + 1.2
            * (1 - 0.75 + 0.75 * (F.col("dl").cast("double") / F.col("avgdl")))
        )
    )
    return j.groupBy("doc_id").agg(
        F.sum(term_score.cast("decimal(38,12)")).cast("double").alias("score")
    )


@query(
    "text_keywords_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM toks
    ), tf AS (
      SELECT doc_id, t.tok, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks, UNNEST(w) AS t(tok)
      WHERE length(t.tok) >= 4
      GROUP BY 1, 2
    ), scored AS (
      SELECT tf.doc_id, tf.tok,
             tf.tf * ln(n.n_docs
                        / CAST(COUNT(*) OVER (PARTITION BY tf.tok) AS DOUBLE))
               AS score
      FROM tf, n
    ), ranked AS (
      SELECT doc_id, tok, round(score, 6) AS tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY round(score, 6) DESC, tok
             ) AS rnk
      FROM scored
    )
    SELECT doc_id, tok AS keyword, tfidf, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def text_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by raw-tf × idf
    (ln(N/df)), the metadata-enrichment step that tags every document
    with its most distinctive vocabulary (≥4-char terms). Rank orders
    by the ROUNDED score with the term as tie-break, so the top-3 set
    is total-ordered and engine-independent; df comes from a
    groupBy(term) whose exchange AQE reuses against the tf probe side
    (no second tokenize scan, no single-task term gather).

    Scale: one corpus scan at runtime; shuffles on (doc_id, term),
    term, doc_id — the term join is AQE-skew-splittable where a
    term-partitioned window would straggle on hot terms."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = d.select(
        "doc_id", F.split(F.lower(F.trim("text")), "\\s+").alias("w")
    )
    n_docs = F.broadcast(
        toks.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    )
    tf = (
        toks.select("doc_id", F.explode("w").alias("tok"))
        .filter(F.length("tok") >= 4)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    # df per term via groupBy + (AQE-sized, skew-splittable) join — a
    # tok-partitioned window gathers each term's rows in ONE task, and
    # stop-word-shaped hot terms make that a straggler at 100 TB; the
    # join routes through AQE's skew handling instead
    dfc = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = tf.join(dfc, "tok").crossJoin(n_docs).withColumn(
        "score",
        F.col("tf") * F.log(F.col("n_docs") / F.col("df")),
    )
    ranked = scored.select(
        "doc_id",
        F.col("tok").alias("keyword"),
        F.round("score", 6).alias("tfidf"),
    ).withColumn(
        "rnk",
        F.row_number()
        .over(
            Window.partitionBy("doc_id").orderBy(
                F.col("tfidf").desc(), "keyword"
            )
        )
        .cast("long"),
    )
    return ranked.filter(F.col("rnk") <= 3)


@query(
    "text_zipf_fit",
    oracle="""
    WITH tf AS (
      SELECT lang, t.tok, CAST(COUNT(*) AS DOUBLE) AS freq
      FROM (SELECT lang,
                   string_split_regex(lower(trim(text)), '\\s+') AS w
            FROM documents) d, UNNEST(w) AS t(tok)
      GROUP BY 1, 2
    ), ranked AS (
      SELECT lang,
             ln(CAST(ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY freq DESC, tok
             ) AS DOUBLE)) AS lx,
             ln(freq) AS ly
      FROM tf
    ), s AS (
      SELECT lang,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(lx AS DECIMAL(38,12))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ly AS DECIMAL(38,12))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(lx * ly AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(lx * lx AS DECIMAL(38,12))) AS DOUBLE) AS sx2
      FROM ranked GROUP BY 1
    )
    SELECT lang, CAST(n AS BIGINT) AS n_types,
           round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6)
             AS zipf_slope
    FROM s
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per language: OLS slope of ln(freq) ~ ln(rank)
    over the token frequency table — natural text sits near −1, and a
    corpus whose slope drifts (boilerplate floods, template spam,
    truncation) fails this cheap distribution-level health check
    before any per-document filter notices.

    Rank ties break on the token so ranks are total-ordered; the
    ln() inputs are then identical integers on both engines, and the
    OLS runs on decimal-accumulated sufficient statistics (the
    agg_linreg_exact discipline). One shuffle on (lang, token); ranks
    come from the GROUPED bucketed-cumulative helper (round-5: this
    window has no rank≤k filter, so WindowGroupLimit cannot prune it
    and a per-lang window would sort each language's ENTIRE vocabulary
    in one task — grouped_ordered_running bounds the sorts at any
    vocab size under identical rank semantics); then an O(types)
    fit."""
    from spark_streaming_with_debezium_spark.operators.scalable_windows import (
        grouped_ordered_running,
    )

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(
            "lang", F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("tok")
        )
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("freq"))
    )
    ranked = grouped_ordered_running(
        tf,
        group_cols=["lang"],
        key=-F.col("freq"),
        order_cols=[F.col("freq").desc(), "tok"],
        rank_name="_rk",
        n_buckets=16,
    ).select(
        "lang",
        F.log(F.col("_rk").cast("double")).alias("lx"),
        F.log("freq").alias("ly"),
    )
    dec = "decimal(38,12)"
    s = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("lx").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("ly").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("lx") * F.col("ly")).cast(dec)).cast("double").alias("sxy"),
        F.sum((F.col("lx") * F.col("lx")).cast(dec)).cast("double").alias("sx2"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "lang",
        F.col("n").cast("long").alias("n_types"),
        F.round(slope, 6).alias("zipf_slope"),
    )


@query(
    "text_boilerplate_ngrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS w
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS g
      FROM toks, UNNEST(range(1, len(w)-8+2)) AS t(i)
    ), counted AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM grams GROUP BY g HAVING COUNT(*) >= 2
    )
    SELECT g AS ngram, n_docs FROM counted
    ORDER BY n_docs DESC, g LIMIT 20
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining: the word 8-grams repeated across the most
    documents — headers, footers, license blurbs, navigation chrome —
    the report a cleaning pipeline uses to build its strip-list
    (``contamination_ngram_overlap`` finds cross-source PAIRS; this
    finds the phrases themselves, ranked by spread).

    Shape: tokenize once, per-doc DISTINCT grams (a doc repeating its
    own header counts once), one map-side-combined groupBy(gram) on a
    uniform key, HAVING ≥ 2 inside the aggregate, top-k as
    TakeOrderedAndProject. No pair generation anywhere — the output
    is O(distinct grams) pre-limit, and the hot-gram skew the pair
    queries must cap is exactly the signal ranked here."""
    d = load_table(spark, sf_dir, "documents")
    from spark_streaming_with_debezium_spark.llm.corpus_rules import (
        normalize_text,
    )

    toks = d.select("doc_id", F.split(normalize_text("text"), " ").alias("w"))
    positions = F.when(
        F.size("w") >= 8, F.sequence(F.lit(1), F.size("w") - 7)
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(positions, lambda i: F.array_join(F.slice("w", i, 8), " "))
        ).alias("ngram"),
    ).distinct()
    counted = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        counted.filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "ngram")
        .limit(20)
    )


@query(
    "retrieval_rrf_hybrid",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(len(w)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM toks
    ), tf AS (
      SELECT doc_id, len(w) AS dl, t.tok, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks, UNNEST(w) AS t(tok)
      WHERE t.tok IN ('table', 'spark', 'merge', 'window')
      GROUP BY 1, 2, 3
    ), df AS (
      SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT tf.doc_id,
             CAST(SUM(CAST(
               ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * (CAST(tf.dl AS DOUBLE) / s.avgdl))))
               AS DECIMAL(38,12))) AS DOUBLE) AS score
      FROM tf JOIN df ON tf.tok = df.tok, stats s
      GROUP BY 1
    ), lex20 AS (
      SELECT doc_id, round(score, 6) AS bm FROM scored
      ORDER BY bm DESC, doc_id LIMIT 20
    ), lexr AS (
      SELECT doc_id, row_number() OVER (ORDER BY bm DESC, doc_id) AS r_lex
      FROM lex20
    ), q AS (
      SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
    ), sem AS (
      SELECT e.vec_id AS doc_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qe AS DOUBLE[])) AS cos
      FROM embeddings e, q
    ), sem20 AS (
      SELECT doc_id, cos FROM sem ORDER BY cos DESC, doc_id LIMIT 20
    ), semr AS (
      SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r_sem
      FROM sem20
    )
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           CAST(COALESCE(l.r_lex, 0) AS INT) AS r_lex,
           CAST(COALESCE(s.r_sem, 0) AS INT) AS r_sem,
           round(COALESCE(1.0 / (60 + l.r_lex), 0)
                 + COALESCE(1.0 / (60 + s.r_sem), 0), 6) AS rrf_score
    FROM lexr l FULL JOIN semr s ON l.doc_id = s.doc_id
    ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
)
def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (k=60): fuse the
    BM25 lexical top-20 with the embedding-cosine top-20 (query =
    vector 0) into one ranking — the standard two-tower + keyword
    stack for corpus search and hard-negative mining, and the query
    that exercises lexical and semantic retrieval TOGETHER.

    Determinism: both source rankings order by (score, doc_id) totals;
    RRF scores are sums of 1/(60+rank) over INTEGER ranks, so both
    engines fuse identical doubles. Scale: each side truncates to its
    top-20 BEFORE ranking (TakeOrderedAndProject — no global sort),
    the rank windows run on ≤20-row frames (the ``_tiny`` census
    convention), and the fusion join touches ≤40 rows. The corpus-
    scale work is exactly one BM25 pass + one brute-force cosine scan
    (swap in the IvfIndex probe for the semantic side at 100 TB)."""
    from pyspark.sql import Window

    from spark_streaming_with_debezium_spark.llm.similarity import (
        cosine_prenormed,
        norm,
    )

    scored = _bm25_scored(load_table(spark, sf_dir, "documents"))
    lex20 = (
        scored.select("doc_id", F.round("score", 6).alias("_tiny_bm"))
        .orderBy(F.col("_tiny_bm").desc(), "doc_id")
        .limit(20)
    )
    lexr = lex20.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("_tiny_bm").desc(), "doc_id"))
        .alias("r_lex"),
    )
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm(F.col("embedding"))
    )
    qv = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qe"), F.col("nrm").alias("qnrm")
        )
    )
    sem20 = (
        e.crossJoin(qv)
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_prenormed(
                F.col("qe"), F.col("embedding"), F.col("qnrm"), F.col("nrm")
            ).alias("_tiny_cos"),
        )
        .orderBy(F.col("_tiny_cos").desc(), "doc_id")
        .limit(20)
    )
    semr = sem20.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("_tiny_cos").desc(), "doc_id"))
        .alias("r_sem"),
    )
    fused = lexr.join(semr, "doc_id", "full")
    rrf = F.coalesce(F.lit(1.0) / (60 + F.col("r_lex")), F.lit(0.0)) + F.coalesce(
        F.lit(1.0) / (60 + F.col("r_sem")), F.lit(0.0)
    )
    # rank 0 = absent from that side's top-20 (NULL ints would come
    # back from the oracle as pandas float64 and hash-mismatch)
    return (
        fused.select(
            "doc_id",
            F.coalesce(F.col("r_lex"), F.lit(0)).alias("r_lex"),
            F.coalesce(F.col("r_sem"), F.lit(0)).alias("r_sem"),
            F.round(rrf, 6).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(10)
    )


@query(
    "text_heavy_hitter_tokens",
    oracle="""
    WITH toks AS (
      SELECT t.tok
      FROM (SELECT string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                               'g'), ' ') AS w
            FROM documents), UNNEST(w) AS t(tok)
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks
    ), c AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY tok
    )
    SELECT c.tok AS token, c.freq
    FROM c, tot WHERE c.freq * 512 >= tot.n
    """,
)
def text_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy-hitter vocabulary: every token holding ≥ 1/512 of
    all token occurrences, with exact counts — the frequency dual of
    the HLL family (operators/sketches.py), and the vocab/stop-list
    report a tokenizer pipeline mines before training.

    The result is exact, but the PLAN is the sketch discipline: a
    mergeable Misra-Gries summary (k=4096 counters) runs per
    partition in one Arrow-batched ``mapInPandas`` pass — per batch a
    vectorized value_counts merges into the counter table, and
    overflow prunes by subtracting the (k+1)-th largest count
    (Agarwal et al.'s mergeable-summaries rule), so any token absent
    from a partition's summary has local count ≤ local_N/4096. The
    union of partition summaries is therefore a PROVABLE superset of
    every global ≥ N/4096 token (⊇ the reported ≥ N/512 set), and the
    exact recount touches only candidates via a broadcast semi join.
    TWO corpus scans total: the MG pass also tallies its partition's
    token count (one extra summary row per partition), so candidates
    AND the global N come out of the same pass. Per-partition
    summaries are then TREE-REDUCED executor-side (a shard-merge
    ``mapInPandas`` pass — merging MG summaries is count-add + the
    same prune, the Agarwal et al. mergeability result — down to one
    final summary), so the driver reads O(k_mg) rows at ANY task
    count; at 10⁵ tasks the old direct collect of every partition's
    summary would have been a multi-GB driver pull. At 100 TB the
    full-vocabulary groupBy would shuffle billions of distinct
    (token, count) pairs; this shuffles only summary rows and the
    candidate recount. Guarantees asserted against the full groupBy
    in ``test_heavy_hitter_candidates_superset``."""
    from spark_streaming_with_debezium_spark.llm.corpus_rules import (
        normalize_text,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(normalize_text("text"), " ")).alias("token")
    )
    k_mg = 4096
    summary = mg_summary_tree(toks, k_mg).collect()
    n_total = sum(r.n_local for r in summary if r.token is None)
    cand_tokens = sorted(r.token for r in summary if r.token is not None)
    if not cand_tokens or n_total == 0:
        return spark.createDataFrame([], "token string, freq long")
    cand = F.broadcast(
        spark.createDataFrame([(t,) for t in cand_tokens], "token string")
    )
    return (
        toks.join(cand, "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * 512 >= F.lit(n_total))
        .select("token", "freq")
    )


def mg_summary_tree(
    toks: DataFrame, k_mg: int, n_shards: int = 32
) -> DataFrame:
    """Mergeable Misra-Gries summary of ``toks.token``, tree-reduced to
    ONE partition holding ≤ k_mg counter rows + one total row
    (token=NULL, n_local=N).

    Level 0 summarizes each input partition (vectorized value_counts
    merge + the (k+1)-th-largest prune). Levels 1..n merge summaries:
    counts ADD, then the same prune — each level's output stays
    ≤ (k_mg+1) rows per shard, and the cumulative decrement across any
    merge tree is ≤ N/(k_mg+1), so every token with global count
    > N/k_mg survives to the root (mergeable-summaries guarantee,
    independent of tree shape). Shards hash on token so a token's
    counters meet; the summary traffic is O(k_mg · shards) rows —
    noise next to the corpus scan. The returned single-partition
    DataFrame is itself a valid MG summary (asserted in tests)."""
    import pandas as pd

    def mg_level0(batches):
        counts: pd.Series = pd.Series(dtype="int64")
        n_local = 0
        for pdf in batches:
            n_local += len(pdf)
            counts = counts.add(pdf["token"].value_counts(), fill_value=0)
            if len(counts) > k_mg:
                # mergeable-MG prune: subtract the (k+1)-th largest
                # count from everything, keep strictly positive
                cut = counts.nlargest(k_mg + 1).iloc[-1]
                counts = counts - cut
                counts = counts[counts > 0]
        yield pd.DataFrame(
            {
                "token": list(counts.index.astype(str)) + [None],
                "cnt": list(counts.astype("int64")) + [0],
                "n_local": [0] * len(counts) + [n_local],
            }
        )

    def mg_merge(batches):
        counts: pd.Series = pd.Series(dtype="int64")
        n_local = 0
        for pdf in batches:
            tok = pdf[pdf["token"].notna()]
            n_local += int(pdf.loc[pdf["token"].isna(), "n_local"].sum())
            counts = counts.add(
                tok.groupby("token")["cnt"].sum(), fill_value=0
            )
            if len(counts) > k_mg:
                cut = counts.nlargest(k_mg + 1).iloc[-1]
                counts = counts - cut
                counts = counts[counts > 0]
        yield pd.DataFrame(
            {
                "token": list(counts.index.astype(str)) + [None],
                "cnt": list(counts.astype("int64")) + [0],
                "n_local": [0] * len(counts) + [n_local],
            }
        )

    schema = "token string, cnt long, n_local long"
    level0 = toks.mapInPandas(mg_level0, schema)
    mid = level0.repartition(n_shards, F.col("token")).mapInPandas(
        mg_merge, schema
    )
    return mid.repartition(1).mapInPandas(mg_merge, schema)


#: BPE induction rounds — part of the query contract (oracle mirrors).
N_BPE_MERGES = 5

_BPE_BASE_SQL = """
    words AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT UNNEST(string_split(
          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
        FROM documents
      ) WHERE regexp_matches(w, '^[a-z]+$')
      GROUP BY w
    ), seq0 AS (
      SELECT array_to_string(string_split(w, ''), '  ') AS seq, cnt FROM words
    )"""

_BPE_ROUND_SQL = """
    pairs{r} AS (
      SELECT s.cnt,
             arr[i] || ' ' || arr[i + 1] AS pair
      FROM (SELECT seq, cnt, string_split(seq, '  ') AS arr FROM seq{p}) s,
           UNNEST(range(1, len(arr))) AS t(i)
    ), top{r} AS (
      SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n
      FROM pairs{r} GROUP BY pair ORDER BY n DESC, pair LIMIT 1
    ), seq{r} AS (
      SELECT regexp_replace(
               s.seq,
               '\\b' || replace(t.pair, ' ', '  ') || '\\b',
               replace(t.pair, ' ', ''), 'g') AS seq,
             s.cnt
      FROM seq{p} s, top{r} t
    )"""


def _bpe_oracle() -> str:
    rounds = ",".join(
        _BPE_ROUND_SQL.format(r=r, p=r - 1) for r in range(1, N_BPE_MERGES + 1)
    )
    finals = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({r} AS BIGINT) AS merge_rank, pair,
           replace(pair, ' ', '') AS new_symbol, n AS pair_count
    FROM top{r}"""
        for r in range(1, N_BPE_MERGES + 1)
    )
    return f"WITH {_BPE_BASE_SQL},{rounds}\n{finals}"


def _learn_bpe(spark: SparkSession, sf_dir: str):
    """Run the BPE induction loop (see :func:`text_bpe_merges` for the
    algorithm and scale discussion). Returns ``(rules, seqs)``: the
    learned merge rules as a lazy (merge_rank, pair, new_symbol,
    pair_count) DataFrame and the final distinct-word histogram with
    all merges applied — i.e. the word → encoded-symbol-sequence
    vocabulary the APPLY step (:func:`text_bpe_encode`) joins against.

    One Spark job per merge round (VERDICT r11 item 5 — the loop was
    scheduling-bound at ~3 jobs/round): each round's winning pair is a
    single-row min-of-struct aggregate ((-n, pair) — exactly the
    count-desc/pair-asc tie-break) crossJoin-broadcast onto the
    histogram (the 1-row scalar pattern), so argmax selection AND
    merge application materialize in the ONE localCheckpoint job; no
    per-round driver collect. The winner additionally RIDES the
    checkpointed frame as constant (pair, n) columns, so the returned
    rules frame is a union of limit(1)s over already-materialized
    checkpoints — collecting it later costs no re-aggregation and no
    corpus rescan. An exhausted round (no pairs left) yields a null
    winner: the histogram passes through unchanged and the round
    contributes no rule row — same fixpoint the old early-break
    reached.

    AQE is pinned OFF for the induction actions (restored in
    finally): on the word HISTOGRAM — thousands of rows after the one
    corpus aggregation — every adaptive stage materialization is a
    separate scheduled job (~3-4/round measured, 29 total), pure
    overhead at any scale since the loop's exchanges are
    histogram-sized by construction. With AQE off each round is its
    checkpoint's single job. Results are plan-identical (the loop has
    no join to re-strategize — the 1-row broadcast is explicit)."""
    from spark_streaming_with_debezium_spark.llm.corpus_rules import (
        normalize_text,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(normalize_text("text"), " ")).alias("w")
    )
    words = (
        toks.filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        rule_frames, seqs = _bpe_rounds(words)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    rules = rule_frames[0]
    for rf_ in rule_frames[1:]:
        rules = rules.unionAll(rf_)
    return rules, seqs


def _bpe_rounds(words: DataFrame):
    """The checkpointed merge loop of :func:`_learn_bpe` — split out so
    the AQE toggle wraps exactly the eager actions."""
    seqs = words.select(
        F.array_join(F.split("w", ""), "  ").alias("seq"), "cnt"
    ).localCheckpoint(eager=True)
    rule_frames = []
    for r in range(1, N_BPE_MERGES + 1):
        arr = F.split("seq", "  ")
        idx = F.when(
            F.size(arr) >= 2, F.sequence(F.lit(1), F.size(arr) - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = seqs.select(
            "cnt",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.concat(
                        F.element_at(arr, i), F.lit(" "), F.element_at(arr, i + 1)
                    ),
                )
            ).alias("pair"),
        )
        # exactly-one-row argmax: min over (-n, pair) = (count desc,
        # pair asc); null struct when no pairs remain
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
            .agg(
                F.min(
                    F.struct(
                        (-F.col("n")).alias("neg_n"), F.col("pair").alias("pair")
                    )
                ).alias("s")
            )
            .select(
                F.col("s.pair").alias("pair"),
                (-F.col("s.neg_n")).cast("long").alias("n"),
            )
        )
        pat = F.concat(
            F.lit("\\b"),
            F.regexp_replace("pair", " ", "  "),
            F.lit("\\b"),
        )
        seqs = (
            seqs.crossJoin(F.broadcast(top))
            .select(
                F.when(F.col("pair").isNull(), F.col("seq"))
                .otherwise(
                    F.regexp_replace(
                        "seq", pat, F.regexp_replace("pair", " ", "")
                    )
                )
                .alias("seq"),
                "cnt",
                "pair",
                "n",
            )
            .localCheckpoint(eager=True)
        )
        rule_frames.append(
            seqs.filter(F.col("pair").isNotNull())
            .select(
                F.lit(r).cast("long").alias("merge_rank"),
                "pair",
                F.regexp_replace("pair", " ", "").alias("new_symbol"),
                F.col("n").alias("pair_count"),
            )
            .limit(1)
        )
        seqs = seqs.select("seq", "cnt")
    return rule_frames, seqs


@query("text_bpe_merges", oracle=_bpe_oracle())
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary induction: the first
    ``N_BPE_MERGES`` byte-pair-encoding merge rules learned from the
    corpus — tokenizer training as a DataFrame program, the upstream
    twin of `pack_sequences`' tokenizer-consuming side.

    Standard BPE-on-word-histogram formulation (Sennrich et al. 2016):
    the corpus is scanned ONCE into an alpha-token histogram; every
    merge round then runs over that small (distinct words × cnt)
    table — adjacent-symbol pair counts weighted by word frequency,
    deterministic argmax (count desc, pair asc), leftmost
    non-overlapping merge application. Symbol sequences are
    double-space-joined strings; the merge is one `regexp_replace`
    with \\b anchors (symbols are [a-z]+, so \\b is unambiguous and
    RE2/Java-identical — both engines verified on the overlap cases
    'a a a' and 'xa b').

    Scale: per round = one explode+groupBy over the histogram (symbol
    pairs, uniform keys) folded WITH the merge application into a
    single checkpointed job — the winning pair is a 1-row aggregate
    broadcast back onto the histogram, never a driver collect
    (VERDICT r11 item 5: the old collect-per-round loop paid ~3
    scheduling slots per merge; the winner rides the checkpointed
    frame as constant columns so emitting the rules is a limit(1) on
    already-materialized data, not a re-aggregation). The corpus
    itself is touched exactly once; production BPE trainers sample
    the histogram the same way. localCheckpoint per round cuts the
    K-deep lineage."""
    rules, _seqs = _learn_bpe(spark, sf_dir)
    return rules.select(
        "merge_rank",
        "pair",
        "new_symbol",
        F.col("pair_count").cast("long").alias("pair_count"),
    )


def _bpe_encode_oracle() -> str:
    """DuckDB dual of the APPLY step: re-learn the merge rules with the
    same 5-round CTE chain as the text_bpe_merges oracle — the final
    ``seq5`` relation IS the word → encoded-sequence vocabulary (the
    symbols of a word concatenate back to the word, so ``w`` is
    recovered by stripping spaces) — then join every document's alpha
    words against it."""
    rounds = ",".join(
        _BPE_ROUND_SQL.format(r=r, p=r - 1) for r in range(1, N_BPE_MERGES + 1)
    )
    return f"""
    WITH {_BPE_BASE_SQL},{rounds},
    vocab AS (
      SELECT replace(seq, ' ', '') AS w,
             CAST(len(string_split(seq, '  ')) AS BIGINT) AS n_sym
      FROM seq{N_BPE_MERGES}
    ),
    docw AS (
      SELECT doc_id, UNNEST(string_split(
        regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
      FROM documents
    ),
    alpha AS (
      SELECT doc_id, w FROM docw WHERE regexp_matches(w, '^[a-z]+$')
    )
    SELECT a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_alpha_words,
           CAST(SUM(v.n_sym) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(length(a.w)) AS BIGINT) AS n_chars_alpha,
           round(CAST(SUM(v.n_sym) AS DOUBLE) / SUM(length(a.w)), 6)
             AS bpe_per_char
    FROM alpha a JOIN vocab v USING (w)
    GROUP BY a.doc_id
    """


@query("text_bpe_encode", oracle=_bpe_encode_oracle())
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step of BPE: tokenize the whole corpus with the merge
    rules :func:`text_bpe_merges` learns, reporting per-document BPE
    token counts and the tokens-per-character compression the rules
    achieve — the consuming half of the tokenizer lifecycle (train =
    induction over the word histogram; encode = per-document token
    accounting that feeds ``pack_sequences``' budget arithmetic).

    Scale shape: encoding never touches documents word-by-word —
    merges apply once per DISTINCT word on the bounded histogram
    (:func:`_learn_bpe`'s final state is precisely the word →
    symbol-sequence vocabulary), and the corpus joins against that
    broadcastable vocab on the uniform word key. Per-word
    merge application is O(vocab · merges), not O(corpus · merges) —
    the same histogram trick production tokenizers use. The oracle
    re-learns the rules AND re-encodes independently in SQL, so a
    drift anywhere in the train→apply chain breaks the value hash.
    """
    _rules, seqs = _learn_bpe(spark, sf_dir)
    vocab = seqs.select(
        F.translate("seq", " ", "").alias("w"),
        F.size(F.split("seq", "  ")).cast("long").alias("n_sym"),
    )
    from spark_streaming_with_debezium_spark.llm.corpus_rules import (
        normalize_text,
    )

    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(normalize_text("text"), " ")).alias("w")
    ).filter(F.col("w").rlike("^[a-z]+$"))
    j = words.join(F.broadcast(vocab), "w")
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_alpha_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
            F.sum(F.length("w")).cast("long").alias("n_chars_alpha"),
        )
        .withColumn(
            "bpe_per_char",
            F.round(
                F.col("n_bpe_tokens").cast("double") / F.col("n_chars_alpha"), 6
            ),
        )
    )


@query(
    "text_pmi_collocations",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    uni AS (
      SELECT unnest(w) AS word FROM toks
    ),
    uc AS (SELECT word, COUNT(*) AS c FROM uni GROUP BY 1),
    ntok AS (SELECT COUNT(*) AS n_tok FROM uni),
    bg AS (
      SELECT w[i] AS w1, w[i+1] AS w2
      FROM toks, UNNEST(range(1, len(w))) AS t(i)
    ),
    bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
    nbig AS (SELECT SUM(cb) AS n_big FROM bc),
    scored AS (
      SELECT b.w1, b.w2, b.cb, u1.c AS c1, u2.c AS c2,
             CAST(b.cb * n.n_tok * n.n_tok AS DOUBLE)
               / CAST(g.n_big * u1.c * u2.c AS DOUBLE) AS lift
      FROM bc b
      JOIN uc u1 ON b.w1 = u1.word
      JOIN uc u2 ON b.w2 = u2.word, ntok n, nbig g
      WHERE b.cb >= 5
    )
    SELECT w1, w2, CAST(cb AS BIGINT) AS cb, CAST(c1 AS BIGINT) AS c1,
           CAST(c2 AS BIGINT) AS c2, round(lift, 6) AS lift
    FROM scored
    ORDER BY lift DESC, w1, w2
    LIMIT 30
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the corpus's top bigrams by pointwise mutual
    information — the classic phrase-discovery pass (Mikolov et al.'s
    word2phrase step, NLTK's collocation finder) a training-data
    pipeline runs to decide which word pairs deserve a single token.
    Scored as the PMI *lift* p(xy)/(p(x)p(y)) = cb·N_tok² /
    (N_big·c1·c2) with a min-count ≥ 5 support gate: both operands are
    EXACT integer products (each < 2⁶³ up to ~10⁹-token corpora; past
    that, rescale counts — both engines raise loudly on bigint
    overflow rather than wrapping) cast once to double, so the single
    division is bit-identical across engines —
    the transcendental-free discipline of `text_token_rarity` (a log2
    PMI would hinge on libm ulp agreement).

    Shape: one exploded token pass feeds the unigram count and the
    1-row total; the bigram table derives from a guarded index
    transform (no self-join); scoring joins the BIGRAM VOCABULARY
    (not the corpus) to the unigram counts on w1/w2 — Zipf-skewed at
    100 TB, handled by AQE skew splitting, and the cb ≥ 5 gate prunes
    the hapax tail before the joins. Top-30 by (lift DESC, w1, w2) is
    a TakeOrderedAndProject, never a global sort."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _words(F.col("text")).alias("w"))
    uni = toks.select(F.explode("w").alias("word"))
    uc = uni.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    ntok = F.broadcast(uni.agg(F.count(F.lit(1)).alias("n_tok")))
    pair_idx = F.when(
        F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bg = toks.select(
        F.explode(
            F.transform(
                pair_idx,
                lambda i: F.struct(
                    F.element_at("w", i).alias("w1"),
                    F.element_at("w", i + F.lit(1)).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    nbig = F.broadcast(bc.agg(F.sum("cb").alias("n_big")))
    u1 = uc.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    lift = (
        (F.col("cb") * F.col("n_tok") * F.col("n_tok")).cast("double")
        / (F.col("n_big") * F.col("c1") * F.col("c2")).cast("double")
    )
    return (
        bc.filter(F.col("cb") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(ntok)
        .crossJoin(nbig)
        .select(
            "w1",
            "w2",
            F.col("cb").cast("long").alias("cb"),
            F.col("c1").cast("long").alias("c1"),
            F.col("c2").cast("long").alias("c2"),
            F.round(lift, 6).alias("lift"),
        )
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(30)
    )


@query(
    "text_keyphrase_rake",
    oracle="""
    WITH toks AS (
      SELECT doc_id, generate_subscripts(words, 1) AS pos,
             unnest(words) AS w
      FROM (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS words
        FROM documents
      )
    ),
    toks2 AS (
      SELECT doc_id, pos, w,
             list_contains(['the','a','and','of','to'], w) AS is_stop
      FROM toks
    ),
    marked AS (
      SELECT doc_id, pos, w, is_stop,
             SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
      FROM toks2
    ),
    runs AS (
      SELECT doc_id, pos, w, run_id FROM marked WHERE NOT is_stop
    ),
    phrases AS (
      SELECT doc_id, run_id,
             string_agg(w, ' ' ORDER BY pos) AS phrase,
             COUNT(*) AS plen
      FROM runs GROUP BY 1, 2
    ),
    ws AS (
      SELECT r.w,
             CAST(CAST(SUM(p.plen) AS DOUBLE) / COUNT(*)
                  AS DECIMAL(38,12)) AS wscore
      FROM runs r JOIN phrases p USING (doc_id, run_id)
      GROUP BY 1
    ),
    scored AS (
      SELECT p.phrase, p.doc_id, p.run_id, SUM(ws.wscore) AS score
      FROM runs r
      JOIN phrases p USING (doc_id, run_id)
      JOIN ws ON r.w = ws.w
      GROUP BY 1, 2, 3
    )
    SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           round(CAST(MAX(score) AS DOUBLE), 6) AS score
    FROM scored
    GROUP BY phrase
    ORDER BY score DESC, phrase
    LIMIT 20
    """,
)
def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — the unsupervised
    phrase miner a curation pipeline runs where TF-IDF keywords are too
    unigram-bound: candidate phrases are maximal stopword-free token
    runs, each word scores deg/freq (deg = Σ length of phrases it
    appears in — the common simplification of co-occurrence degree),
    and a phrase scores the sum of its member word scores; corpus
    top-20 by (score DESC, phrase).

    Determinism: run boundaries come from an exact integer stopword
    cumsum PARTITIONED BY DOC (no global window); each word score is
    one division of exact integers, then snapped to DECIMAL(38,12) so
    the per-phrase SUM is order-independent (the `text_token_rarity`
    discipline — summing raw doubles would be partial-order-dependent).
    Identical phrases score identically by construction (corpus-level
    word scores), so the cross-corpus rollup is exact.

    Shape: one token explode; run assembly is a per-doc window + one
    groupBy(doc, run) with a sorted-struct collect; word scores join
    the RUN VOCABULARY (Zipf-skewed at 100 TB — AQE skew split);
    top-20 is TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), "\\s+")).alias(
            "pos", "w"
        ),
    ).withColumn("is_stop", F.col("w").isin(*STOPWORDS["en"]))
    from pyspark.sql import Window

    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        toks.withColumn(
            "run_id",
            F.sum(F.when(F.col("is_stop"), 1).otherwise(0)).over(wdoc),
        )
        .filter(~F.col("is_stop"))
        .select("doc_id", "pos", "w", "run_id")
    )
    phrases = runs.groupBy("doc_id", "run_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    members = runs.join(phrases, ["doc_id", "run_id"])
    ws = members.groupBy("w").agg(
        (F.sum("plen").cast("double") / F.count(F.lit(1)))
        .cast("decimal(38,12)")
        .alias("wscore")
    )
    scored = (
        members.join(ws, "w")
        .groupBy("phrase", "doc_id", "run_id")
        .agg(F.sum("wscore").alias("score"))
    )
    return (
        scored.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.round(F.max("score").cast("double"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(20)
    )


#: vocabulary-size grid for the coverage curve (tokenizer budgeting:
#: what fraction of all token OCCURRENCES does a top-N vocab cover).
VOCAB_COVERAGE_NS = (100, 1000)


def _vocab_coverage_oracle() -> str:
    per_n = " UNION ALL ".join(
        f"""
        SELECT CAST({n} AS BIGINT) AS vocab_size,
               CAST(SUM(cnt) FILTER (rnk <= {n}) AS BIGINT) AS covered
        FROM ranked"""
        for n in VOCAB_COVERAGE_NS
    )
    return f"""
    WITH toks AS (
      SELECT unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
             AS tok
      FROM documents
    ),
    counts AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks WHERE tok <> '' GROUP BY tok
    ),
    ranked AS (
      SELECT tok, cnt,
             row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
      FROM counts
    ),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n_vocab
          FROM counts),
    per_n AS ({per_n})
    SELECT p.vocab_size, p.covered, t.total, t.n_vocab,
           round(CAST(p.covered AS DOUBLE) / t.total, 6) AS coverage
    FROM per_n p, t
    """


@query("text_vocab_coverage", oracle=_vocab_coverage_oracle())
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — for each candidate vocab size N
    (``VOCAB_COVERAGE_NS``), the fraction of ALL token occurrences a
    top-N frequency vocabulary covers (everything else would hit
    <unk>/byte-fallback): the measured basis for choosing a tokenizer
    vocab budget, next to ``text_zipf_fit``'s parametric view. Every
    number is exact integer counting with a pinned (cnt DESC, tok)
    rank order + one final double division, so the curve value-hashes.

    Scale shape: one token explode → map-side-combined groupBy(tok);
    each top-N is orderBy+limit (TakeOrdered — never a global window,
    the scalable_windows discipline); the 1-row total broadcasts."""
    from spark_streaming_with_debezium_spark.llm.corpus_rules import (
        normalize_text,
    )

    d = load_table(spark, sf_dir, "documents")
    # VERDICT r9 item 6: one cached aggregate — totals + each top-N
    # branch re-ran the corpus explode+groupBy otherwise (the dominant
    # cost at scale, recomputed len(NS)+1 times). Bounded cache: one
    # (tok, cnt) row per vocabulary entry, map-side-combined.
    counts = (
        d.select(F.explode(F.split(normalize_text("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
    )
    per_n = None
    for n in VOCAB_COVERAGE_NS:
        row = (
            counts.orderBy(F.col("cnt").desc(), "tok")
            .limit(n)
            .agg(
                F.lit(n).cast("long").alias("vocab_size"),
                F.sum("cnt").cast("long").alias("covered"),
            )
        )
        per_n = row if per_n is None else per_n.unionByName(row)
    return per_n.crossJoin(F.broadcast(totals)).select(
        "vocab_size",
        "covered",
        "total",
        "n_vocab",
        F.round(F.col("covered").cast("double") / F.col("total"), 6).alias(
            "coverage"
        ),
    )

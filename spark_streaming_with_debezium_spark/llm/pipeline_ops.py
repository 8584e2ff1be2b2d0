"""Dataset-pipeline operators: split assignment, cross-split
contamination, stratified sampling.

The bookkeeping half of a training-data pipeline — all deterministic,
so a re-run (or a retried stage at 100 TB) produces byte-identical
splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.llm.corpus_rules import (
    GATE_MAX_CHARS,
    GATE_MIN_CHARS,
    GATE_MIN_WORDS,
    content_md5,
    gate_passes,
    holdout_split_expr,
    normalize_text,
    split_expr,
    token_count,
)
from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table


@query(
    "split_train_eval",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, lang,
             CASE WHEN substr(md5(text), 1, 2) < '0a' THEN 'eval'
                  WHEN substr(md5(text), 1, 2) < '14' THEN 'heldout'
                  ELSE 'train' END AS split
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs
    FROM assigned GROUP BY split, lang
    """,
)
def split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash split (~4% eval, ~4% heldout, rest
    train via md5 prefix ranges) — reproducible across engines, runs,
    and cluster sizes; no RNG state to manage."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(split_expr().alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "contamination_cross_source",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, source, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
      FROM documents
    )
    SELECT a.doc_id AS doc_id, a.source AS source,
           b.doc_id AS dup_of, b.source AS dup_source
    FROM hashed a JOIN hashed b
      ON a.h = b.h AND a.source <> b.source AND a.doc_id > b.doc_id
    """,
)
def contamination_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination: documents whose normalized content
    also appears under a DIFFERENT source (the train/test-leak check).
    Hash join on content hash — uniform keys, no skew."""
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select("doc_id", "source", content_md5("text").alias("h"))
    a, b = hashed.alias("a"), hashed.alias("b")
    return a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.source") != F.col("b.source"))
        & (F.col("a.doc_id") > F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.source").alias("source"),
        F.col("b.doc_id").alias("dup_of"),
        F.col("b.source").alias("dup_source"),
    )


@query(
    "contamination_ngram_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, source, array_to_string(w[i:i+4], ' ') AS g
      FROM toks, UNNEST(range(1, len(w)-5+2)) AS t(i)
    ), kept AS (
      -- mirror the Spark side's max_gram_docs cap: grams shared by
      -- more docs than the cap are boilerplate, not contamination
      SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= 64
    )
    SELECT a.doc_id AS doc_id, a.source AS source,
           b.doc_id AS dup_of, b.source AS dup_source,
           COUNT(*) AS n_shared
    FROM grams a JOIN grams b
      ON a.g = b.g AND a.source <> b.source AND a.doc_id > b.doc_id
    JOIN kept k ON a.g = k.g
    GROUP BY 1, 2, 3, 4
    """,
)
def contamination_ngram_overlap(
    spark: SparkSession, sf_dir: str, max_gram_docs: int = 64
) -> DataFrame:
    """Partial contamination: cross-source document pairs sharing at
    least one word 5-gram, with the shared-distinct-gram count — the
    n-gram decontamination check used to scrub eval sets out of
    training data (exact-hash contamination misses near-verbatim
    leaks).

    Shape (single-consumer, like the banded MinHash plan): tokenize
    ONCE into a column (the split must not be a higher-order-function
    lambda child — it would re-evaluate per gram position), generate
    positions with a guarded sequence (Spark's sequence(1, 0) counts
    DOWN, so short docs need an empty array, not a reversed one),
    explode + distinct per doc, then groupBy(gram) and generate the
    cross-source pairs INSIDE each gram group with higher-order
    functions — a gram self-join would recompute the whole
    tokenize/explode/distinct lineage for the second side (documents
    scanned twice; plan-asserted single-scan in tests/test_plans.py).
    Three uniform-keyed shuffles.

    Stop-phrase gram skew is BOUNDED, not just noted: a window count
    over the gram partitioning drops groups larger than
    ``max_gram_docs`` BEFORE the collect_list — the exact ``max_bucket``
    discipline from ``lsh_candidate_pairs`` (llm/dedup.py). Without it
    a boilerplate 5-gram shared by m docs builds an m-element array in
    ONE row and O(m²) pairs; with it no array exceeds the cap and the
    dropped grams carry no contamination signal (they're corpus-wide
    boilerplate by definition). The filter rides the same hash
    partitioning as the groupBy — no extra exchange."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.split(normalize_text("text"), " ").alias("w")
    )
    positions = F.when(
        F.size("w") >= 5, F.sequence(F.lit(1), F.size("w") - 4)
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(positions, lambda i: F.array_join(F.slice("w", i, 5), " "))
        ).alias("g"),
    ).distinct()
    from pyspark.sql import Window

    wg = Window.partitionBy("g")
    capped = (
        grams.repartition(F.col("g"))
        .withColumn("gsize", F.count(F.lit(1)).over(wg))
        .filter(F.col("gsize") <= max_gram_docs)
        .drop("gsize")
    )
    per_gram = capped.groupBy("g").agg(
        F.collect_list(F.struct("doc_id", "source")).alias("ds")
    )
    pair_structs = F.flatten(
        F.transform(
            "ds",
            lambda a: F.transform(
                F.filter(
                    "ds",
                    lambda b: (a["doc_id"] > b["doc_id"])
                    & (a["source"] != b["source"]),
                ),
                lambda b: F.struct(
                    a["doc_id"].alias("doc_id"),
                    a["source"].alias("source"),
                    b["doc_id"].alias("dup_of"),
                    b["source"].alias("dup_source"),
                ),
            ),
        )
    )
    return (
        per_gram.select(F.explode(pair_structs).alias("p"))
        .groupBy("p.doc_id", "p.source", "p.dup_of", "p.dup_source")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@query(
    "sample_weights_by_source",
    oracle="""
    WITH per_src AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+')))
                  AS BIGINT) AS n_tokens
      FROM documents
      GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(n_tokens) AS DOUBLE) AS all_tokens,
             CAST(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(38,9)))
                  AS DOUBLE) AS z
      FROM per_src
    )
    SELECT source, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / all_tokens, 6) AS raw_share,
           round(sqrt(CAST(n_tokens AS DOUBLE)) / z, 6) AS temp_share,
           round(least(1.0, (sqrt(CAST(n_tokens AS DOUBLE)) / z) * 2000.0
                            / CAST(n_tokens AS DOUBLE)), 6) AS sample_rate
    FROM per_src, tot
    """,
)
def sample_weights_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture rebalancing: per-source sampling rates that hit a
    token budget under temperature-scaled shares (α=0.5, the
    multilingual-training up-weighting of small sources). ``raw_share``
    is the natural mix, ``temp_share`` the √-scaled target mix,
    ``sample_rate`` = min(1, target_tokens/actual_tokens) for a 2,000
    token budget — the number a sampler feeds to ``sampleBy``.

    sqrt is IEEE-correctly-rounded (engines agree bit-exactly, unlike
    ln), and the √-share denominator accumulates in DECIMAL so the
    4-row sum is order-independent. One groupBy(source) + a broadcast
    1-row totals cross join — O(sources) output, trivially 100 TB-safe."""
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("n_tokens"),
    )
    tot = F.broadcast(
        per_src.agg(
            F.sum("n_tokens").cast("double").alias("all_tokens"),
            F.sum(F.sqrt(F.col("n_tokens").cast("double")).cast("decimal(38,9)"))
            .cast("double")
            .alias("z"),
        )
    )
    temp_share = F.sqrt(F.col("n_tokens").cast("double")) / F.col("z")
    return per_src.crossJoin(tot).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("all_tokens"), 6).alias(
            "raw_share"
        ),
        F.round(temp_share, 6).alias("temp_share"),
        F.round(
            F.least(
                F.lit(1.0),
                temp_share * 2000.0 / F.col("n_tokens").cast("double"),
            ),
            6,
        ).alias("sample_rate"),
    )


@query(
    "corpus_curation_funnel",
    oracle="""
    WITH flags AS (
      SELECT doc_id, text,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h,
             (n_chars BETWEEN 100 AND 520) AS f1,
             (len(string_split_regex(trim(text), '\\s+')) >= 30) AS f2,
             (CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                / n_chars >= 0.82) AS f3
      FROM documents
    ), ranked AS (
      SELECT doc_id, text, f1, f2, f3, (f1 AND f2 AND f3) AS passes,
             row_number() OVER (
               PARTITION BY h
               ORDER BY (f1 AND f2 AND f3) DESC, doc_id
             ) AS rn
      FROM flags
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS s0,
             CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS s3,
             CAST(SUM(CASE WHEN passes AND rn = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS s4
      FROM ranked
    ), canon AS (
      SELECT doc_id,
             CASE WHEN substr(md5(text), 1, 2) < '14'
                  THEN 'holdout' ELSE 'train' END AS split,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS w
      FROM ranked WHERE passes AND rn = 1
    ), grams AS (
      SELECT DISTINCT doc_id, split, array_to_string(w[i:i+4], ' ') AS g
      FROM canon, UNNEST(range(1, len(w)-5+2)) AS t(i)
    ), kept AS (
      SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= 64
    ), hold_grams AS (
      SELECT DISTINCT gr.g FROM grams gr JOIN kept k ON gr.g = k.g
      WHERE gr.split = 'holdout'
    ), dirty AS (
      SELECT CAST(COUNT(DISTINCT gr.doc_id) AS BIGINT) AS n_dirty
      FROM grams gr JOIN hold_grams h ON gr.g = h.g
      WHERE gr.split = 'train'
    )
    SELECT '0_total' AS stage, s0 AS n_docs FROM s
    UNION ALL SELECT '1_length', s1 FROM s
    UNION ALL SELECT '2_min_words', s2 FROM s
    UNION ALL SELECT '3_alpha_ratio', s3 FROM s
    UNION ALL SELECT '4_dedup_canonical', s4 FROM s
    UNION ALL SELECT '5_decontaminated', s4 - n_dirty FROM s, dirty
    """,
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel: per-stage survivor counts for the
    standard pretraining filter chain — length bounds, minimum word
    count, alphabetic-ratio quality gate, exact-dedup canonical
    selection among the survivors, then n-gram decontamination of the
    train split against the hash-holdout split (round 5). The
    one-line answer to "how much data is left after cleaning, and
    which gate ate it?" — the report every corpus build starts from,
    and the count-level oracle of ``run_curation_job``.

    All gate flags are computed in one projection; the dedup stage
    needs a per-content-hash window, and ordering that window by
    (passes DESC, doc_id) makes rank-1 rows the canonical survivors
    WITHOUT a second pass over the filtered subset. Stage 5 reuses
    ``contaminated_train_ids`` — the SAME definition the job applies —
    over the canonical survivors (text rides the one md5 shuffle).
    The final stack() unpivot turns the 1-row aggregates into the
    6-row funnel — constant-size from there."""
    d = load_table(spark, sf_dir, "documents")
    f1 = F.col("n_chars").between(GATE_MIN_CHARS, GATE_MAX_CHARS)
    f2 = token_count() >= GATE_MIN_WORDS
    flagged = d.select(
        "doc_id",
        "text",
        content_md5("text").alias("h"),
        f1.alias("f1"),
        (f1 & f2).alias("f12"),
        gate_passes().alias("passes"),
    )
    ranked = flagged.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("h").orderBy(F.col("passes").desc(), "doc_id")
        ),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum(F.col("f1").cast("long")).alias("s1"),
        F.sum(F.col("f12").cast("long")).alias("s2"),
        F.sum(F.col("passes").cast("long")).alias("s3"),
        F.sum((F.col("passes") & (F.col("rn") == 1)).cast("long")).alias("s4"),
    )
    canon = ranked.filter(F.col("passes") & (F.col("rn") == 1)).select(
        "doc_id", holdout_split_expr().alias("split"), "text"
    )
    dirty = F.broadcast(
        contaminated_train_ids(canon).agg(
            F.count(F.lit(1)).alias("n_dirty")
        )
    )
    return s.crossJoin(dirty).selectExpr(
        "stack(6, '0_total', s0, '1_length', s1, '2_min_words', s2,"
        " '3_alpha_ratio', s3, '4_dedup_canonical', s4,"
        " '5_decontaminated', s4 - n_dirty) AS (stage, n_docs)"
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(1 AS BIGINT) AS within_bound
    FROM documents
    WHERE lang IN ('en', 'es', 'de', 'zh', 'fr')
    GROUP BY lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: per-language fractions via sampleBy with a
    fixed seed (deterministic per Spark version — asserted in tests);
    the shape used for eval-set carving and data ablations.

    Bound-check face (extends VERDICT r7 item 2 beyond the four named
    queries): the sampled counts are Spark-RNG-specific, so the query
    emits each stratum's total plus ``within_bound`` = 1 iff the
    sampled count sits inside the Bernoulli 3σ interval
    |n_sampled − f·n| ≤ 3·√(f(1−f)·n) + 1; the oracle emits totals
    with a literal 1, making the driver hash certify that the sampler
    actually delivers its requested per-stratum rates."""
    d = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.1, "es": 0.3, "de": 0.3, "zh": 0.3, "fr": 0.3}
    frac = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )
    base = (
        d.filter(F.col("lang").isin(*fractions))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_total"))
    )
    sampled = (
        d.sampleBy("lang", fractions, seed=42)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    f = frac[F.col("lang")]
    n = F.col("n_total").cast("double")
    bound = 3.0 * F.sqrt(f * (1.0 - f) * n) + F.lit(1.0)
    return base.join(sampled, "lang", "left").select(
        "lang",
        "n_total",
        (
            F.abs(F.coalesce(F.col("n_sampled"), F.lit(0)) - f * n) <= bound
        )
        .cast("long")
        .alias("within_bound"),
    )


@query(
    "pack_sequences",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    run AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS running
      FROM toks
    )
    SELECT doc_id, source, n_tokens,
           CAST((running - n_tokens) // 2048 AS BIGINT) AS seq_id,
           CAST((running - n_tokens) % 2048 AS BIGINT) AS seq_offset
    FROM run
    """,
)
def pack_sequences(
    spark: SparkSession, sf_dir: str, bucket_docs: int = 8192
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document a
    position in the fixed-length (2048-token) training sequences formed
    by concatenating the per-source document stream in doc_id order —
    ``seq_id`` is the sequence its first token lands in, ``seq_offset``
    the offset there. The deterministic packing used by
    concat-then-chunk dataloaders (vs bin-packing heuristics, which
    need global state and aren't reproducible under re-partitioning).

    Scale shape (round-5 fix): sources are few and large, so a window
    partitioned by source alone sorts an entire source in ONE task.
    Instead the stream key is sharded to (source, doc_id-range bucket)
    — ``floor(doc_id / bucket_docs)`` is monotonic in doc_id, so
    ordering by doc_id within a bucket preserves the global per-source
    order — and the running sum becomes two passes: (1) per-bucket
    token totals (map-side-combined aggregate, O(N / bucket_docs)
    rows) cumulated into per-bucket starting offsets by a window over
    the TINY totals table; (2) a running sum within each bounded
    (≤ bucket_docs rows) bucket partition, plus the joined offset.
    Integer arithmetic end-to-end, so the result is bit-identical to
    the single-window formulation — asserted by
    ``test_pack_sequences_bucketed_identical``."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        token_count("text").cast("long").alias("n_tokens"),
        F.floor(F.col("doc_id") / bucket_docs).alias("_bkt"),
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        toks.groupBy("source", "_bkt")
        .agg(F.sum("n_tokens").alias("_tot"))
        .select(
            "source",
            "_bkt",
            F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off"),
        )
    )
    w = (
        Window.partitionBy("source", "_bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = toks.join(F.broadcast(offsets), ["source", "_bkt"]).withColumn(
        "running", F.sum("n_tokens").over(w) + F.col("_off")
    )
    start = F.col("running") - F.col("n_tokens")
    return run.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(start / 2048).cast("long").alias("seq_id"),
        (start % 2048).cast("long").alias("seq_offset"),
    )


@query(
    "pack_efficiency_report",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    run AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS running
      FROM toks
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST((SUM(n_tokens) + 2047) // 2048 AS BIGINT) AS n_seqs,
           CAST((SUM(n_tokens) + 2047) // 2048 * 2048 - SUM(n_tokens)
                AS BIGINT) AS tail_padding,
           CAST(SUM(CASE WHEN n_tokens > 0
                          AND (running - 1) // 2048
                              <> (running - n_tokens) // 2048
                         THEN 1 ELSE 0 END) AS BIGINT) AS boundary_docs,
           round(CAST(SUM(n_tokens) AS DOUBLE)
                 / CAST((SUM(n_tokens) + 2047) // 2048 * 2048 AS DOUBLE), 6)
             AS utilization
    FROM run GROUP BY 1
    """,
)
def pack_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing observability: per-source report over the
    `pack_sequences` assignment — sequences produced, tail padding
    (the only padding concat-and-chunk ever emits), documents split
    across a sequence boundary (attention-contamination candidates),
    and utilization = tokens / (sequences x 2048). The dashboard
    number a training-data team watches to pick sequence length and
    judge whether boundary-crossing losses justify bin-packing
    instead.

    Derives everything from the pack_sequences output itself (same
    bucketed two-pass running sum, integer arithmetic end-to-end —
    one double division per GROUP at the very end), so report and
    packing cannot drift apart. A doc crosses a boundary iff its
    first and last token land in different sequences:
    floor((running-1)/2048) != seq_id, guarded for empty docs.
    Scale shape: inherits pack_sequences' bounded windows, then ONE
    map-side-combined rollup on source."""
    packed = pack_sequences(spark, sf_dir)
    start = F.col("seq_id") * 2048 + F.col("seq_offset")
    end_seq = F.floor((start + F.col("n_tokens") - 1) / 2048)
    crosses = (F.col("n_tokens") > 0) & (end_seq != F.col("seq_id"))
    total = F.sum("n_tokens")
    n_seqs = F.floor((total + 2047) / 2048).cast("long")
    return packed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        total.cast("long").alias("total_tokens"),
        n_seqs.alias("n_seqs"),
        (n_seqs * 2048 - total).cast("long").alias("tail_padding"),
        F.sum(crosses.cast("long")).alias("boundary_docs"),
        F.round(
            total.cast("double") / (n_seqs * 2048).cast("double"), 6
        ).alias("utilization"),
    )


@query(
    "curriculum_quality_tiers",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_words,
             ntile(5) OVER (
               PARTITION BY lang
               ORDER BY len(string_split_regex(trim(text), '\\s+')), doc_id
             ) AS tier
      FROM documents
    )
    SELECT lang, tier,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_words) AS BIGINT) AS min_words,
           CAST(MAX(n_words) AS BIGINT) AS max_words,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM scored GROUP BY 1, 2
    """,
)
def curriculum_quality_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: per-language quality quintiles (here scored
    by document word count; any deterministic score column drops in)
    with per-tier doc and token tallies — the table a curriculum
    dataloader samples from (short/low tiers early, long/high tiers
    late). ntile needs a total order to be deterministic: ties on the
    score are broken by doc_id, so the same document always lands in
    the same tier on every engine and partitioning.

    Lang is a skewed key (en dominates), so a plain
    ``Window.partitionBy(lang)`` ntile sorts half the corpus in one
    task at 100 TB. Round-5 fix: exact per-lang ranks from the
    GROUPED bucketed-cumulative helper (per-lang percentile_approx
    boundaries → (lang, bucket) windows → per-bucket offsets —
    operators/scalable_windows.py) re-expressed as ntile(5) by
    integer arithmetic over per-lang counts. Identical quintile
    semantics, unchanged oracle; bounded sorts at any skew."""
    from spark_streaming_with_debezium_spark.operators.scalable_windows import (
        grouped_ordered_running,
        ntile_from_rank,
    )

    d = load_table(spark, sf_dir, "documents")
    # the ONE tokenizer definition (corpus_rules) — a tokenizer change
    # cannot diverge between the gates/packing and the curriculum tiers
    n_words = token_count("text").cast("long")
    scored = d.select("lang", "doc_id", n_words.alias("n_words"))
    ranked = grouped_ordered_running(
        scored,
        group_cols=["lang"],
        key=F.col("n_words"),
        order_cols=["n_words", "doc_id"],
        rank_name="_lrk",
        n_buckets=16,
    )
    per_lang = F.broadcast(
        scored.groupBy("lang").agg(F.count(F.lit(1)).alias("_ln"))
    )
    tiered = ranked.join(per_lang, "lang").select(
        "lang",
        "n_words",
        ntile_from_rank(F.col("_lrk"), F.col("_ln"), 5).alias("tier"),
    )
    return tiered.groupBy("lang", "tier").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_words").alias("min_words"),
        F.max("n_words").alias("max_words"),
        F.sum("n_words").alias("total_words"),
    )


def contaminated_train_ids(
    docs_split: DataFrame, max_gram_docs: int = 64
) -> DataFrame:
    """doc_ids of TRAIN documents sharing any non-boilerplate word
    5-gram with a non-train document. Input needs (doc_id, split,
    text); any split value other than ``'train'`` counts as holdout.
    The shared core of ``decontaminate_train_ngram`` (the standalone
    query) and the curation job's decontamination stage — one
    definition, so job and oracle cannot drift.

    Shape: tokenize once, explode distinct grams per doc, cap gram
    groups at ``max_gram_docs`` BEFORE any join (boilerplate grams
    carry no contamination signal), then semi-join train grams
    against the distinct holdout-gram set on the uniform gram key."""
    assigned = docs_split.select(
        "doc_id",
        F.when(F.col("split") == "train", "train")
        .otherwise("holdout")
        .alias("split"),
        F.split(normalize_text("text"), " ").alias("w"),
    )
    positions = F.when(
        F.size("w") >= 5, F.sequence(F.lit(1), F.size("w") - 4)
    ).otherwise(F.array().cast("array<int>"))
    grams = assigned.select(
        "doc_id",
        "split",
        F.explode(
            F.transform(positions, lambda i: F.array_join(F.slice("w", i, 5), " "))
        ).alias("g"),
    ).distinct()
    wg = Window.partitionBy("g")
    capped = (
        grams.repartition(F.col("g"))
        .withColumn("gsize", F.count(F.lit(1)).over(wg))
        .filter(F.col("gsize") <= max_gram_docs)
        .drop("gsize")
    )
    hold_grams = (
        capped.filter(F.col("split") == "holdout").select("g").distinct()
    )
    return (
        capped.filter(F.col("split") == "train")
        .join(hold_grams, "g", "left_semi")
        .select("doc_id")
        .distinct()
    )



@query(
    "decontaminate_train_ngram",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, source,
             CASE WHEN substr(md5(text), 1, 2) < '14'
                  THEN 'holdout' ELSE 'train' END AS split,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS w
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, split, array_to_string(w[i:i+4], ' ') AS g
      FROM assigned, UNNEST(range(1, len(w)-5+2)) AS t(i)
    ), kept AS (
      SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= 64
    ), hold_grams AS (
      SELECT DISTINCT gr.g FROM grams gr JOIN kept k ON gr.g = k.g
      WHERE gr.split = 'holdout'
    ), contaminated AS (
      SELECT DISTINCT gr.doc_id
      FROM grams gr JOIN hold_grams h ON gr.g = h.g
      WHERE gr.split = 'train'
    )
    SELECT a.source,
           CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM assigned a LEFT JOIN contaminated c ON a.doc_id = c.doc_id
    WHERE a.split = 'train'
    GROUP BY 1
    """,
)
def decontaminate_train_ngram(
    spark: SparkSession, sf_dir: str, max_gram_docs: int = 64
) -> DataFrame:
    """The APPLY step of n-gram decontamination: drop from the train
    split every document sharing any (non-boilerplate) word 5-gram
    with the holdout split, reporting per-source removed/kept tallies.
    ``contamination_ngram_overlap`` reports pairs; this one composes
    split assignment (the ``split_train_eval`` hash rule) → capped
    gram inventory → semi join against holdout grams → left-anti-style
    rollup, i.e. the operation a pipeline actually runs before
    training.

    Scale notes: the gram group cap (same ``max_gram_docs`` discipline
    as the other gram queries) bounds the hot-gram blowup BEFORE the
    semi join. The holdout gram set is ~8% of all grams — small at
    test scale but NOT broadcast-safe at 100 TB, so the semi join
    shuffles on the uniform gram key and AQE downgrades it to a
    broadcast automatically whenever the holdout side measures small.
    'contaminated' is a distinct doc-id set joined back to the train
    projection (doc_id, source — pruned scan)."""
    d = load_table(spark, sf_dir, "documents")
    assigned = d.select(
        "doc_id", "source", holdout_split_expr().alias("split"), "text"
    )
    contaminated = contaminated_train_ids(assigned, max_gram_docs)
    train = assigned.filter(F.col("split") == "train").select("doc_id", "source")
    flagged = train.join(
        contaminated.withColumn("is_dirty", F.lit(1)), "doc_id", "left"
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum(F.when(F.col("is_dirty").isNotNull(), 1).otherwise(0)).alias(
            "n_removed"
        ),
        F.sum(F.when(F.col("is_dirty").isNull(), 1).otherwise(0)).alias("n_kept"),
    )


@query(
    "sample_hash_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    )
    SELECT doc_id, lang, CAST(sample_rank AS INT) AS sample_rank
    FROM ranked WHERE sample_rank <= 5
    """,
)
def sample_hash_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group uniform sample: the k docs per language
    with the smallest content-independent hash rank — the reproducible
    dual of a per-group reservoir sample (same k docs on every run,
    engine, partitioning, and cluster size; no RNG state, no seed
    drift between Spark versions — unlike ``sample_stratified``, which
    is pinned to Spark's sampleBy implementation). The eval-set
    carving shape: "give me 5 random-but-stable docs per language".

    One window shuffle partitioned by lang; rank ≤ k filters inside
    the window stage. At 100 TB with skewed langs, swap row_number for
    an approx-quantile threshold on the hash (same discipline as the
    scalable_windows family) — the hash is uniform, so the k-th
    smallest is a predictable cutoff."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= 5)
    )


#: RAG chunking contract — part of the query surface (the oracle
#: hard-codes the same numbers): 60-word windows, 12-word overlap.
CHUNK_WORDS = 60
CHUNK_OVERLAP = 12
_CHUNK_STEP = CHUNK_WORDS - CHUNK_OVERLAP


@query(
    "rag_chunk_documents",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
      FROM documents WHERE length(trim(text)) > 0
    ), sized AS (
      SELECT doc_id, words, CAST(len(words) AS BIGINT) AS n FROM w
    ), st AS (
      SELECT doc_id, words, n,
             unnest(generate_series(1, greatest(n - {CHUNK_OVERLAP}, 1),
                                    {_CHUNK_STEP})) AS start
      FROM sized
    )
    SELECT md5(CAST(doc_id AS VARCHAR) || ':'
               || CAST(CAST((start - 1) / {_CHUNK_STEP} AS BIGINT)
                       AS VARCHAR)) AS chunk_id,
           doc_id,
           CAST((start - 1) / {_CHUNK_STEP} AS BIGINT) AS chunk_idx,
           array_to_string(
             list_slice(words, start,
                        least(start + {CHUNK_WORDS} - 1, n)), ' ')
             AS chunk_text,
           CAST(least({CHUNK_WORDS}, n - start + 1) AS BIGINT) AS n_words
    FROM st
    """,
)
def rag_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-ready document chunking: every document explodes into
    60-word windows with 12 words of overlap (start step 48) and a
    stable content-addressable chunk id ``md5(doc_id:chunk_idx)`` —
    the step between a curated corpus and an embedding/indexing run
    (overlap keeps answers that straddle a boundary retrievable; the
    stable id makes re-chunks idempotent upserts into a vector store,
    the same keyed-merge discipline as the CDC state table).

    Entirely array higher-order functions — split once, one
    ``sequence`` of window starts per doc, ``posexplode`` + ``slice``
    — no UDFs, no shuffle at all (chunking is embarrassingly
    parallel; the plan is scan → project → generate). Start positions
    and word counts are integers, chunk text re-joins the SAME word
    array both engines split identically — value-hash-exact.
    Degenerate docs (≤ overlap words) emit exactly one chunk from the
    ``greatest(n − overlap, 1)`` bound; empty docs are filtered on
    both sides."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    words = F.split(F.trim("text"), r"\s+")
    base = d.select(
        "doc_id",
        words.alias("words"),
        F.size(words).cast("long").alias("n"),
    )
    starts = F.sequence(
        F.lit(1).cast("long"),
        F.greatest(F.col("n") - CHUNK_OVERLAP, F.lit(1).cast("long")),
        F.lit(_CHUNK_STEP).cast("long"),
    )
    chunk_idx = ((F.col("start") - 1) / _CHUNK_STEP).cast("bigint")
    return (
        base.select(
            "doc_id",
            "words",
            "n",
            F.explode(starts).alias("start"),
        )
        .select(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("doc_id").cast("string"),
                    chunk_idx.cast("string"),
                )
            ).alias("chunk_id"),
            "doc_id",
            chunk_idx.alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("words"), F.col("start"), F.lit(CHUNK_WORDS)),
                " ",
            ).alias("chunk_text"),
            F.least(
                F.lit(CHUNK_WORDS).cast("long"),
                F.col("n") - F.col("start") + 1,
            ).alias("n_words"),
        )
    )


#: Portable checksum modulus shared with the MinHash family (2^31-1):
#: residues stay < 2^31, so even 10^9-row per-group sums fit in BIGINT
#: on both engines.
_CHECKSUM_P = 2147483647

#: Token-budget mixing: each source keeps its best docs until 40% of
#: its token mass is selected (numerator/denominator kept integer so
#: the budget is engine-exact).
BUDGET_NUM, BUDGET_DEN = 2, 5


@query(
    "corpus_token_budget_mix",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS tok,
             CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
               / n_chars AS alpha,
             CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % {_CHECKSUM_P} AS hid
      FROM documents
    ), r AS (
      SELECT source, tok, hid,
             CAST(SUM(tok) OVER (PARTITION BY source) AS BIGINT) AS tok_total,
             CAST(SUM(tok) OVER (
               PARTITION BY source ORDER BY alpha DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum
      FROM t
    ), s AS (
      SELECT source, tok, hid, tok_total,
             CAST(floor(CAST(tok_total * {BUDGET_NUM} AS DOUBLE)
                        / {BUDGET_DEN}) AS BIGINT) AS budget_tok,
             (cum <= CAST(floor(CAST(tok_total * {BUDGET_NUM} AS DOUBLE)
                                / {BUDGET_DEN}) AS BIGINT)) AS sel
      FROM r
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN sel THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
           CAST(MAX(tok_total) AS BIGINT) AS tok_total,
           CAST(MAX(budget_tok) AS BIGINT) AS budget_tok,
           CAST(SUM(CASE WHEN sel THEN tok ELSE 0 END) AS BIGINT)
             AS tok_selected,
           CAST(SUM(CASE WHEN sel THEN hid ELSE 0 END) AS BIGINT)
             AS ids_checksum
    FROM s GROUP BY source
    """,
)
def corpus_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-constrained corpus selection: within every source,
    keep documents in quality order (alpha-ratio desc, doc_id tiebreak)
    until 40% of that source's token mass is spent — the greedy
    budgeted-mix step between computing mixture *rates*
    (:func:`sample_weights_by_source`) and materializing the actual
    training subset. ``ids_checksum`` (sum of portable 60-bit doc-id
    hashes mod 2^31-1, order-independent) pins the exact selected SET,
    not just its size, so the oracle catches a selection that picks
    different documents with identical totals.

    Shape: one shuffle on ``source``; the per-source ordered cumsum is
    a window whose partition count equals the source count — at 100 TB
    with few huge sources, swap in the bucketed-cumulative helper
    (``operators/scalable_windows.py``, the curriculum-tiers fix) for
    bounded sorts; arithmetic is integer end-to-end so the rewrite is
    bit-identical. The quality score and budget are integer-derived
    doubles (exact division, floor), so ordering and cutoff agree
    across engines bit-for-bit.
    """
    d = load_table(spark, sf_dir, "documents")
    hid = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % _CHECKSUM_P
    )
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast(
        "double"
    ) / F.col("n_chars")
    base = d.select(
        "doc_id",
        "source",
        token_count("text").cast("long").alias("tok"),
        alpha.alias("alpha"),
        hid.alias("hid"),
    )
    w_all = Window.partitionBy("source")
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.col("alpha").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = base.select(
        "source",
        "tok",
        "hid",
        F.sum("tok").over(w_all).alias("tok_total"),
        F.sum("tok").over(w_cum).alias("cum"),
    )
    budget = F.floor(
        (F.col("tok_total") * BUDGET_NUM).cast("double") / BUDGET_DEN
    ).cast("long")
    s = r.withColumn("budget_tok", budget).withColumn(
        "sel", F.col("cum") <= F.col("budget_tok")
    )
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("sel"), 1).otherwise(0)).cast("long").alias("n_selected"),
        F.max("tok_total").alias("tok_total"),
        F.max("budget_tok").alias("budget_tok"),
        F.sum(F.when(F.col("sel"), F.col("tok")).otherwise(0))
        .cast("long")
        .alias("tok_selected"),
        F.sum(F.when(F.col("sel"), F.col("hid")).otherwise(0))
        .cast("long")
        .alias("ids_checksum"),
    )


#: DSIR hashed-feature space (2^10 here; 2^16+ at 100 TB — bounded and
#: broadcastable either way) and the importance-model target domain.
DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "zh"


@query(
    "sample_importance_dsir",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ), f AS (
      SELECT doc_id, lang,
             CAST(CONCAT('0x', substr(md5(tok), 1, 15)) AS BIGINT)
               % {DSIR_BUCKETS} AS feat
      FROM toks
    ), pdf AS (
      SELECT doc_id, lang, feat, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM f GROUP BY 1, 2, 3
    ), raw AS (
      SELECT feat, CAST(SUM(cnt) AS BIGINT) AS cr FROM pdf GROUP BY feat
    ), tgt AS (
      SELECT feat, CAST(SUM(cnt) AS BIGINT) AS ct
      FROM pdf WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY feat
    ), tot AS (
      SELECT CAST((SELECT SUM(cnt) FROM pdf) AS BIGINT) AS tr,
             CAST((SELECT SUM(cnt) FROM pdf
                   WHERE lang = '{DSIR_TARGET_LANG}') AS BIGINT) AS tt
    ), lr AS (
      SELECT r.feat,
             ln(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) / (tt + {DSIR_BUCKETS}))
               - ln(CAST(r.cr + 1 AS DOUBLE) / (tr + {DSIR_BUCKETS})) AS lr
      FROM raw r LEFT JOIN tgt t ON r.feat = t.feat, tot
    )
    SELECT p.doc_id, p.lang,
           CAST(SUM(p.cnt) AS BIGINT) AS n_tokens,
           round(CAST(SUM(CAST(p.cnt * l.lr AS DECIMAL(38,12))) AS DOUBLE), 6)
             AS dsir_logweight
    FROM pdf p JOIN lr l ON p.feat = l.feat
    GROUP BY 1, 2
    """,
)
def sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023):
    per-document log importance weight ln(p_target/p_raw) under hashed
    unigram bag models with Laplace(+1) smoothing — the weight a
    domain-targeted sampler resamples by to tilt a raw corpus toward a
    target domain (here the ``zh`` slice stands in for "target").

    Scale shape, per the paper: features are HASHED into a fixed
    ``DSIR_BUCKETS``-bucket space, so both language models are bounded
    tables independent of corpus size — the log-ratio table broadcasts
    (1024 rows here, 2^16 at 100 TB) and per-doc scoring is a map-side
    join + one groupBy(doc_id). Two bounded-output shuffles total; no
    step is O(vocabulary). Determinism: ratios are integer-derived
    doubles (identical division), ln under the idf/zipf precedent, and
    the per-doc sum accumulates in DECIMAL(38,12) so executor ordering
    cannot move the result.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    feat = (
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
        % DSIR_BUCKETS
    )
    pdf = (
        toks.select("doc_id", "lang", feat.alias("feat"))
        .groupBy("doc_id", "lang", "feat")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    raw = pdf.groupBy("feat").agg(F.sum("cnt").alias("cr"))
    tgt = (
        pdf.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("feat")
        .agg(F.sum("cnt").alias("ct"))
    )
    tot = F.broadcast(
        pdf.agg(
            F.sum("cnt").alias("tr"),
            F.sum(
                F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("cnt")).otherwise(0)
            ).alias("tt"),
        )
    )
    lr = (
        raw.join(tgt, "feat", "left")
        .na.fill(0, ["ct"])
        .crossJoin(tot)
        .select(
            "feat",
            (
                F.log(
                    (F.col("ct") + 1).cast("double")
                    / (F.col("tt") + DSIR_BUCKETS)
                )
                - F.log(
                    (F.col("cr") + 1).cast("double")
                    / (F.col("tr") + DSIR_BUCKETS)
                )
            ).alias("lr"),
        )
    )
    return (
        pdf.join(F.broadcast(lr), "feat")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.round(
                F.sum((F.col("cnt") * F.col("lr")).cast("decimal(38,12)")).cast(
                    "double"
                ),
                6,
            ).alias("dsir_logweight"),
        )
    )


#: Perplexity-filter gate: max average NLL (nats/token) a document may
#: score under the corpus's own hashed-unigram LM and still be kept.
#: 3.45 sits at ~p90 of the synthetic corpus's NLL distribution
#: (range ~3.42-3.73), so the gate actually rejects the worst decile
#: rather than being vacuously permissive.
PPL_NLL_MAX = 3.45


@query(
    "quality_perplexity_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ), f AS (
      SELECT doc_id, lang,
             CAST(CONCAT('0x', substr(md5(tok), 1, 15)) AS BIGINT)
               % {DSIR_BUCKETS} AS feat
      FROM toks
    ), pdf AS (
      SELECT doc_id, lang, feat, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM f GROUP BY 1, 2, 3
    ), lm AS (
      SELECT feat, CAST(SUM(cnt) AS BIGINT) AS cf FROM pdf GROUP BY feat
    ), tot AS (
      SELECT CAST((SELECT SUM(cnt) FROM pdf) AS BIGINT) AS t
    ), lp AS (
      SELECT feat,
             ln(CAST(cf + 1 AS DOUBLE) / (t + {DSIR_BUCKETS})) AS logp
      FROM lm, tot
    ), scored AS (
      SELECT p.doc_id, p.lang,
             CAST(SUM(p.cnt) AS BIGINT) AS n_tokens,
             round(CAST(SUM(CAST(p.cnt * -l.logp AS DECIMAL(38,12)))
                        AS DOUBLE) / SUM(p.cnt), 6) AS avg_nll
      FROM pdf p JOIN lp l ON p.feat = l.feat
      GROUP BY 1, 2
    )
    SELECT doc_id, lang, n_tokens, avg_nll,
           (avg_nll <= {PPL_NLL_MAX}) AS kept
    FROM scored
    """,
)
def quality_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based quality filtering (the CCNet/Gopher gate): each
    document scored by its average negative log-likelihood under a
    language model, documents above the NLL ceiling dropped. Stands in
    the KenLM slot with the corpus's OWN hashed-unigram LM (Laplace+1,
    ``DSIR_BUCKETS`` buckets) — the production swap is a pretrained
    LM's per-token scores; the distributed shape is identical.

    Same scale shape as `sample_importance_dsir` (whose LM machinery
    this shares): the LM is a bounded table independent of corpus
    size, broadcast to a map-side join; per-doc scoring is one
    groupBy(doc_id). Determinism: ln over integer-derived ratios, the
    per-doc sum accumulates in DECIMAL(38,12), one double division by
    n_tokens, and the keep decision compares the ROUNDED score so both
    engines agree at the boundary."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    feat = (
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
        % DSIR_BUCKETS
    )
    pdf = (
        toks.select("doc_id", "lang", feat.alias("feat"))
        .groupBy("doc_id", "lang", "feat")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lm = pdf.groupBy("feat").agg(F.sum("cnt").alias("cf"))
    tot = F.broadcast(pdf.agg(F.sum("cnt").alias("t")))
    lp = lm.crossJoin(tot).select(
        "feat",
        F.log(
            (F.col("cf") + 1).cast("double") / (F.col("t") + DSIR_BUCKETS)
        ).alias("logp"),
    )
    avg_nll = F.round(
        F.sum((F.col("cnt") * -F.col("logp")).cast("decimal(38,12)")).cast(
            "double"
        )
        / F.sum("cnt"),
        6,
    )
    return (
        pdf.join(F.broadcast(lp), "feat")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            avg_nll.alias("avg_nll"),
        )
        .withColumn("kept", F.col("avg_nll") <= PPL_NLL_MAX)
    )


#: Training-shard fan-out: hash-mod assignment (embarrassingly
#: parallel; NO global sort — the ntile alternative serializes the
#: corpus through one ordered pass, which cannot survive 100 TB).
N_SHARDS = 8


@query(
    "shuffle_shard_manifest",
    oracle=f"""
    WITH h AS (
      SELECT CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS tok,
             CAST(CONCAT('0x', substr(
               md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               AS hv
      FROM documents
    ), s AS (
      SELECT hv % {N_SHARDS} AS shard, tok,
             hv % {_CHECKSUM_P} AS hm
      FROM h
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM s)
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           CAST(SUM(hm) AS BIGINT) AS checksum,
           round(CAST(COUNT(*) AS DOUBLE) * {N_SHARDS} / n_all, 6)
             AS balance_ratio
    FROM s, tot GROUP BY shard, n_all
    """,
)
def shuffle_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pre-training shuffle + shard manifest: every
    document lands in one of ``N_SHARDS`` output shards by a salted
    portable hash of its id — the "global shuffle" every LLM dataloader
    needs, done WITHOUT a global sort (hash-mod assignment is a pure
    projection; a ``ntile``-over-hash-order formulation funnels the
    whole corpus through one ordered pass). The manifest is what the
    writer job publishes: per-shard doc/token counts, an
    order-independent content checksum (sum of hash residues mod
    2^31-1 — catches a single misrouted document), and the
    docs-per-shard balance ratio (hash balance is statistical, so the
    manifest REPORTS the realized imbalance instead of assuming
    uniformity). Re-runs and retried stages reproduce shard membership
    exactly: no RNG state, no partitioning dependence.
    """
    d = load_table(spark, sf_dir, "documents")
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("shard|"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    s = d.select(
        (hv % N_SHARDS).alias("shard"),
        token_count("text").cast("long").alias("tok"),
        (hv % _CHECKSUM_P).alias("hm"),
    )
    tot = F.broadcast(s.agg(F.count(F.lit(1)).alias("n_all")))
    return (
        s.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("n_tokens"),
            F.sum("hm").alias("checksum"),
        )
        .crossJoin(tot)
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            "checksum",
            F.round(
                F.col("n_docs").cast("double") * N_SHARDS / F.col("n_all"), 6
            ).alias("balance_ratio"),
        )
    )


_BM_BITS = 1 << 22  # 4 Mi-bit membership bitmap → 65536 longs (512 KB)


@query(
    "decontaminate_bitmap_prefilter",
    oracle="""
    WITH assigned AS (
      SELECT doc_id,
             CASE WHEN substr(md5(text), 1, 2) < '14'
                  THEN 'holdout' ELSE 'train' END AS split,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS w
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, split, array_to_string(w[i:i+4], ' ') AS g
      FROM assigned, UNNEST(range(1, len(w)-5+2)) AS t(i)
    ),
    hg AS (SELECT DISTINCT g FROM grams WHERE split = 'holdout')
    SELECT gr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_grams
    FROM grams gr JOIN hg USING (g)
    WHERE gr.split = 'train'
    GROUP BY 1
    """,
)
def decontaminate_bitmap_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram decontamination behind a BITMAP PREFILTER — the
    Bloom-filter pattern for the 100 TB case where even a semi join of
    all train grams is the dominant shuffle: the holdout gram set is
    folded into a fixed 4 Mi-bit membership bitmap (bounded at 65536
    longs REGARDLESS of corpus size — the words table is capped by the
    bitmap geometry, not the data), embedded as ONE array literal, and
    every train gram is tested MAP-SIDE with two integer ops before
    anything shuffles. Only the surviving ~(true hits + FP rate) grams
    enter the exact verify join, which removes the false positives —
    so the result is EXACT (a k=1 Bloom filter has no false negatives)
    and carries the same full value-hash oracle as the plain semi-join
    face. At ~100k holdout grams the FP rate is ~2.4%; size the bitmap
    to the holdout gram count at scale (m ≈ 40·n bits for ~2.5%).

    vs ``decontaminate_train_ngram``: same split rule and gram
    definition; this face reports per-doc hit counts (the audit view),
    derives per-doc-distinct grams with ``array_distinct`` instead of
    a corpus-wide distinct (no train-side shuffle before the
    prefilter), and trades the boilerplate gram cap for the map-side
    prune — the verify join stays bounded by the FP rate instead.

    Plan shape: train grams never shuffle until after the bitmap
    test; the bitmap build aggregates the (small) holdout side down to
    ≤65536 (idx, word) rows collected driver-side (the bounded-collect
    precedent: ADC LUTs, Lloyd centroids) and rides back in as a
    BROADCAST 1-row crossJoin — a JoinedRow wrapper streamed into the
    filter, dropped by the projection before anything shuffles.
    (Measured at sf0.1: a 65536-element ``F.lit(list)`` lowers to a
    per-row CreateArray — 63 s; the broadcast row probes the same
    bitmap at 3.8 s, within noise of the semi-join face once the gram
    explode is accounted.)"""
    d = load_table(spark, sf_dir, "documents")
    assigned = d.select(
        "doc_id",
        holdout_split_expr().alias("split"),
        F.split(normalize_text("text"), " ").alias("w"),
    )
    positions = F.when(
        F.size("w") >= 5, F.sequence(F.lit(1), F.size("w") - 4)
    ).otherwise(F.array().cast("array<int>"))
    gram_arr = F.array_distinct(
        F.transform(positions, lambda i: F.array_join(F.slice("w", i, 5), " "))
    )
    tg = assigned.filter(F.col("split") == "train").select(
        "doc_id", F.explode(gram_arr).alias("g")
    )
    hg = (
        assigned.filter(F.col("split") == "holdout")
        .select(F.explode(gram_arr).alias("g"))
        .distinct()
    )

    # ---- bitmap build: holdout grams → occupied 64-bit words ----
    m_bits = _BM_BITS
    hb = hg.select(F.pmod(F.xxhash64("g"), F.lit(m_bits)).alias("b")).distinct()
    words = (
        hb.select(
            F.shiftright("b", 6).alias("idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(b, 64) AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("idx")
        .agg(F.bit_or("mask").alias("wrd"))
        .collect()  # bounded: ≤ m_bits/64 rows whatever the corpus size
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[int(r["idx"])] = int(r["wrd"])
    # ONE broadcast row, probed in place — NOT F.lit(dense): a list
    # literal lowers to per-row CreateArray (O(m) per gram, measured
    # 17× slower at sf0.1); the broadcast row's array is deserialized
    # once per task and element_at is O(1)
    bm_df = spark.createDataFrame([(dense,)], "bm array<bigint>")

    # ---- map-side membership prune, then exact verify ----
    probed = tg.crossJoin(F.broadcast(bm_df)).select(
        "doc_id", "g", "bm", F.pmod(F.xxhash64("g"), F.lit(m_bits)).alias("b")
    )
    hit = (
        F.element_at("bm", (F.shiftright("b", 6) + 1).cast("int")).bitwiseAND(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(b, 64) AS INT))")
        )
        != 0
    )
    cand = probed.filter(hit).select("doc_id", "g")
    return (
        cand.join(hg, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit_grams"))
    )


@query(
    "sample_balanced_classes",
    oracle="""
    WITH counts AS (
      SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1
    ),
    floor_n AS (SELECT MIN(n) AS n_min FROM counts),
    ranked AS (
      SELECT vec_id, label,
             row_number() OVER (
               PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
             ) AS sample_rank
      FROM embeddings
    )
    SELECT r.vec_id, r.label, CAST(r.sample_rank AS INT) AS sample_rank
    FROM ranked r, floor_n f
    WHERE r.sample_rank <= f.n_min
    """,
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling — the rebalancing pass a training
    pipeline runs before fitting on skewed labels: every label keeps
    exactly n_min rows (the size of the RAREST class), chosen by the
    content-independent hash rank (`sample_hash_topk_per_group`'s
    reproducible-reservoir discipline — same rows on every run,
    engine, partitioning and cluster size; no RNG).

    Shape: one count aggregate (map-side combined) feeding a 1-row
    n_min broadcast; one window shuffle PARTITIONED BY LABEL with the
    rank filter inside the window stage. At 100 TB with a dominant
    class the biggest label partition carries the sort — swap
    row_number for an approx-quantile hash threshold (the hash is
    uniform, so the n_min-th smallest is a predictable cutoff) per the
    scalable_windows note on `sample_hash_topk_per_group`."""
    e = load_table(spark, sf_dir, "embeddings")
    n_min = F.broadcast(
        e.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n").alias("n_min"))
    )
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    ranked = e.select(
        "vec_id", "label", F.row_number().over(w).alias("sample_rank")
    )
    return ranked.crossJoin(n_min).filter(
        F.col("sample_rank") <= F.col("n_min")
    ).select("vec_id", "label", "sample_rank")


#: Systematic-PPS draw count — 100 picks across the corpus's total
#: weight, thresholds at every W/100 of cumulative mass.
PPS_M = 100


@query(
    "sample_systematic_pps",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS wt FROM documents),
    tot AS (SELECT SUM(wt) AS W FROM w),
    cums AS (
      SELECT doc_id, wt,
             SUM(wt) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM w)
    SELECT c.doc_id, c.wt AS weight,
           CAST((c.cum * {PPS_M}) // t.W
                - ((c.cum - c.wt) * {PPS_M}) // t.W AS BIGINT) AS n_picks
    FROM cums c, tot t
    WHERE (c.cum * {PPS_M}) // t.W > ((c.cum - c.wt) * {PPS_M}) // t.W
    """,
)
def sample_systematic_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: lay the
    corpus's documents end-to-end on a number line by weight
    (``n_chars``), then pick the document under every W/m-th mass
    threshold — the survey-sampling classic that delivers EXACTLY m
    draws with inclusion probability ∝ weight, deterministically, with
    pure integer arithmetic (picks = (cum·m) div W − ((cum−w)·m) div
    W; a doc heavier than W/m is drawn multiple times, reported in
    ``n_picks``). The deterministic integer formulation is what lets a
    weighted sampler carry a full value-hash oracle — ``sampleBy``'s
    RNG face (``sample_stratified``) can only bound-check.

    Scale shape: the global cumulative mass uses the bucketed two-pass
    running-sum primitive (``scalable_windows.global_ordered_running``
    — per-bucket windows + a broadcast O(buckets) offset frame), never
    a single-task global window; the 1-row corpus total broadcasts."""
    from spark_streaming_with_debezium_spark.operators.scalable_windows import (
        global_ordered_running,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("wt")
    )
    cums = global_ordered_running(
        d, key=F.col("doc_id"), order_cols=["doc_id"], sums={"cum": F.col("wt")}
    )
    tot = d.agg(F.sum("wt").alias("W"))
    picked = cums.crossJoin(F.broadcast(tot)).withColumn(
        "n_picks",
        F.expr(f"(cum * {PPS_M}) div W - ((cum - wt) * {PPS_M}) div W"),
    )
    return picked.filter(F.col("n_picks") >= 1).select(
        "doc_id", F.col("wt").alias("weight"), "n_picks"
    )


@query(
    "sample_temperature_mix",
    oracle="""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1
    ),
    w AS (
      SELECT source, n_docs,
             CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(38,6)) AS wd
      FROM s
    ),
    t AS (
      SELECT CAST(SUM(wd) AS DECIMAL(38,6)) AS total,
             CAST(SUM(n_docs) AS BIGINT) AS total_docs
      FROM w
    )
    SELECT source, n_docs,
           round(CAST(wd AS DOUBLE) / CAST(total AS DOUBLE), 6) AS weight,
           round((CAST(wd AS DOUBLE) / CAST(total AS DOUBLE))
                 / (CAST(n_docs AS DOUBLE) / CAST(total_docs AS DOUBLE)), 6)
             AS boost
    FROM w, t
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights — the multilingual /
    multi-source mixing recipe (mT5/XLM-R style): sample source i with
    probability ∝ n_i^α so low-resource sources are upweighted without
    drowning the head. α = 1/2 here because sqrt is a CORRECTLY-ROUNDED
    IEEE primitive (bit-identical cross-engine), where a general
    ``pow(n, 0.7)`` may differ by an ulp between engines; the weight
    normalization accumulates the per-source sqrt in decimal(38,6)
    (order-independent — functions/numeric.py discipline), so the whole
    mix table value-hashes. ``boost`` = weight / natural share: the
    over/undersampling factor each source receives at this temperature.

    Scale shape: one groupBy(source) aggregate (map-side combined) to
    O(sources) rows; the 1-row total frame broadcasts. At 100 TB
    nothing but the per-source counts ever moves."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = s.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.sqrt(F.col("n_docs").cast("double"))
        .cast("decimal(38,6)")
        .alias("wd"),
    )
    totals = w.agg(
        F.sum("wd").cast("decimal(38,6)").alias("total"),
        F.sum("n_docs").cast("long").alias("total_docs"),
    )
    weight = F.col("wd").cast("double") / F.col("total").cast("double")
    natural = F.col("n_docs").cast("double") / F.col("total_docs").cast(
        "double"
    )
    return w.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        F.round(weight, 6).alias("weight"),
        F.round(weight / natural, 6).alias("boost"),
    )

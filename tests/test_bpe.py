"""Planted-corpus tests for distributed BPE induction (the oracle
sweep checks engine equivalence; these check the ALGORITHM against
hand-computed merges)."""

import pyspark.sql.functions as F

from spark_streaming_with_debezium_spark.registry import load_all


def _run_on_docs(spark, tmp_path, texts):
    import os
    import shutil

    base = "/root/testdata/sf0.001"
    sf = tmp_path / "sf"
    sf.mkdir()
    for t in os.listdir(base):
        shutil.copy(os.path.join(base, t), sf / t)
    docs = spark.createDataFrame(
        [(f"d{i}", t, "en", "s", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    q = load_all()["text_bpe_merges"]
    return [tuple(r) for r in q.fn(spark, str(sf)).orderBy("merge_rank").collect()]


def test_bpe_learns_planted_bigram(spark, tmp_path):
    """Corpus dominated by 'abab': round 1 must merge the most frequent
    pair. Hand computation: pairs of a b a b = (a,b)x2 + (b,a)x1 per
    occurrence; with 10 'abab' + 2 'xy', top pair is 'a b' (20),
    then 'ab ab' (10 — adjacency after the merge), then 'x y' (2)."""
    rows = _run_on_docs(spark, tmp_path, ["abab " * 10 + "xy xy"])
    assert rows[0][1:] == ("a b", "ab", 20), rows[0]
    assert rows[1][1:] == ("ab ab", "abab", 10), rows[1]
    # 'x y' count 2 must eventually win a round over exhausted pairs
    assert ("x y", "xy", 2) in [r[1:] for r in rows]


def test_bpe_overlap_counts_and_merges_leftmost(spark, tmp_path):
    """'aaaa': pair (a,a) counts 3 per word (overlapping pairs count),
    merge is leftmost non-overlapping: a a a a -> aa aa, then (aa,aa)
    merges next."""
    rows = _run_on_docs(spark, tmp_path, ["aaaa " * 4])
    assert rows[0][1:] == ("a a", "aa", 12), rows[0]
    assert rows[1][1:] == ("aa aa", "aaaa", 4), rows[1]


def test_bpe_encode_matches_hand_tokenization(spark, tmp_path):
    """Planted corpus where the merge sequence and the resulting
    per-word token counts are hand-computable: encode must report
    exactly those counts, and train→apply must be consistent (encoding
    with the learned vocab, not a stale or re-derived one)."""
    import os
    import shutil

    base = "/root/testdata/sf0.001"
    sf = tmp_path / "sf"
    sf.mkdir()
    for t in os.listdir(base):
        shutil.copy(os.path.join(base, t), sf / t)
    # one doc: 10x 'abab' + 2x 'xy'. Learned merges (see the planted
    # bigram test): a b->ab, ab ab->abab, x y->xy, then no pairs left
    # inside 'abab'/'xy' (rounds 4-5 merge whatever remains — here
    # nothing, the histogram is exhausted after 3).
    text = "abab " * 10 + "xy xy"
    docs = spark.createDataFrame(
        [("0", text, "en", "s", len(text))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    from spark_streaming_with_debezium_spark.registry import load_all

    rows = load_all()["text_bpe_encode"].fn(spark, str(sf)).collect()
    assert len(rows) == 1
    r = rows[0]
    # 12 alpha words (10 'abab' + 2 'xy'); after merges each word is
    # ONE token; chars = 10*4 + 2*2 = 44
    assert r.n_alpha_words == 12
    assert r.n_bpe_tokens == 12
    assert r.n_chars_alpha == 44
    assert abs(r.bpe_per_char - round(12 / 44, 6)) < 1e-9

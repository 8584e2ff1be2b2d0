"""Canonical corpus-policy expressions — the single definition of the
rules every curation-related query AND the production job share:
content normalization/hashing, quality gates, split assignment, and
the packing sequence length.

Why one module: these expressions appeared in four places (funnel,
split, decontamination, curation job) before this existed; a threshold
tuned in one copy but not another makes the production job silently
diverge from the oracle-checked queries that document its semantics.
The DuckDB oracle SQL strings intentionally do NOT share from here —
they are the independent mirror the driver checks against, so each
query spells its SQL out in full.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Fixed training-sequence length for concat-and-chunk packing.
SEQ_LEN = 2048

#: Quality-gate thresholds (corpus_curation_funnel stages 1–3).
GATE_MIN_CHARS = 100
GATE_MAX_CHARS = 520
GATE_MIN_WORDS = 30
GATE_MIN_ALPHA = 0.82

#: md5(text)-prefix split boundaries (~4% eval, ~4% heldout).
SPLIT_EVAL_MAX = "0a"
SPLIT_HOLDOUT_MAX = "14"


def normalize_text(c: Column | str) -> Column:
    """Whitespace-collapsed, lowercased, trimmed content — the
    normalization under every exact-dedup/contamination hash."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.lower(F.trim(col)), "\\s+", " ")


def content_md5(c: Column | str) -> Column:
    return F.md5(normalize_text(c))


def token_count(c: Column | str = "text") -> Column:
    """Whitespace token count - the SAME tokenization under the
    min-words gate, n_tokens accounting, and SEQ_LEN packing (one
    definition: a tokenizer change cannot diverge between gate and
    packing arithmetic)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.size(F.split(F.trim(col), "\\s+"))


def gate_passes(text: str = "text", n_chars: str = "n_chars") -> Column:
    """The composite length/min-words/alpha-ratio quality gate."""
    f1 = F.col(n_chars).between(GATE_MIN_CHARS, GATE_MAX_CHARS)
    f2 = token_count(text) >= GATE_MIN_WORDS
    f3 = (
        F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
        / F.col(n_chars)
    ) >= GATE_MIN_ALPHA
    return f1 & f2 & f3


def split_expr(text: str = "text") -> Column:
    """Deterministic 3-way split from the md5(text) prefix."""
    prefix = F.substring(F.md5(text), 1, 2)
    return (
        F.when(prefix < SPLIT_EVAL_MAX, "eval")
        .when(prefix < SPLIT_HOLDOUT_MAX, "heldout")
        .otherwise("train")
    )


def holdout_split_expr(text: str = "text") -> Column:
    """Binary train/holdout collapse of :func:`split_expr` (the
    decontamination view: everything non-train is holdout)."""
    return F.when(
        F.substring(F.md5(text), 1, 2) < SPLIT_HOLDOUT_MAX, "holdout"
    ).otherwise("train")

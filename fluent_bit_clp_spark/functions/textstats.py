"""Text-analysis functions for training-data pipelines (driver brief §extras).

All native Column expressions (JVM, codegen) — language-ID heuristic,
quality scoring, token counting, document fingerprinting.  Regex syntax is
kept portable (no backslash classes) so the DuckDB oracle can run the same
patterns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Portable token pattern: runs of non-space characters.
TOKEN_RE = "[^ ]+"
WORD_RE = "[a-z0-9]+"

# Tiny per-language stopword fingerprints for the n-gram/stopword heuristic.
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is"]


def token_count(text: str = "text") -> Column:
    """Whitespace token count (BPE-ish subword counting is ~chars/4)."""
    return F.size(F.expr(f"regexp_extract_all({text}, '{TOKEN_RE}', 0)")).cast("bigint")


# BPE-ish pre-tokenizer: contractions | letter runs | digit runs | other
# non-space | spaces.  Portable syntax (works in Java regex, RE2, Python).
BPE_ISH_RE = "'[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+| +"


def bpe_ish_token_count(text: str = "text") -> Column:
    """Count of BPE-style pre-tokens (the standard GPT-2-ish split classes,
    minus lookarounds RE2 lacks)."""
    return F.size(
        F.expr(f"regexp_extract_all({text}, \"{BPE_ISH_RE}\", 0)")
    ).cast("bigint")


def subword_estimate(text: str = "text") -> Column:
    """Cheap BPE-token estimate: ceil(chars / 4) — the standard heuristic."""
    return F.ceil(F.length(F.col(text)) / F.lit(4)).cast("bigint")


def stopword_ratio(text: str = "text") -> Column:
    words = f"regexp_extract_all(lower({text}), '{WORD_RE}', 0)"
    stops = ",".join(f"'{w}'" for w in STOPWORDS_EN)
    hits = f"size(filter({words}, w -> w in ({stops})))"
    return F.expr(
        f"case when size({words}) = 0 then 0.0D "
        f"else cast({hits} as double) / size({words}) end"
    )


def punct_ratio(text: str = "text") -> Column:
    return F.expr(
        f"case when length({text}) = 0 then 0.0D else "
        f"cast(length(regexp_replace({text}, '[A-Za-z0-9 ]', '')) as double)"
        f" / length({text}) end"
    )


def quality_score(text: str = "text") -> Column:
    """Composite [0,1] quality: length band + low punct + stopword presence.

    Deterministic arithmetic over counts — identical in the SQL oracle.
    """
    len_ok = F.expr(f"case when length({text}) between 50 and 20000 then 1.0D else 0.0D end")
    return F.round(
        0.5 * len_ok + 0.3 * (1 - F.least(punct_ratio(text) * 4, F.lit(1.0)))
        + 0.2 * F.least(stopword_ratio(text) * 10, F.lit(1.0)),
        4,
    )


def lang_id(text: str = "text") -> Column:
    """Stopword-fingerprint language ID (en vs unknown) — the n-gram
    heuristic at its cheapest; real corpora swap in per-language tables."""
    return F.when(stopword_ratio(text) > 0.03, F.lit("en")).otherwise(F.lit("unk"))


def fingerprint(text: str = "text") -> Column:
    """Normalization-stable document fingerprint (md5 of normalized words;
    md5 so the DuckDB oracle reproduces it byte-for-byte)."""
    normalized = F.expr(
        f"array_join(regexp_extract_all(lower({text}), '{WORD_RE}', 0), ' ')"
    )
    return F.md5(normalized)


# ---------------------------------------------------------------------------
# Staged variants (VERDICT r2 #2): the composite functions above re-expand
# the tokenizer regex + interpreted filter() HOF inside every consumer
# expression — Catalyst's subexpression elimination does not reach across
# interpreted HOFs, so selecting stop_ratio + punct_ratio + quality together
# evaluated regexp_extract_all ~3× per row (t_quality 1.2 s → 9.8 s).
# The *_from builders take already-materialized intermediate COLUMNS;
# CollapseProject will not inline a non-cheap alias referenced more than
# once, so each intermediate is computed exactly once per row.  Same exact
# arithmetic, so oracle hashes are unchanged.
# ---------------------------------------------------------------------------


def words_array(text: str = "text") -> Column:
    """The shared tokenizer — materialize once, feed the *_from builders."""
    return F.expr(f"regexp_extract_all(lower({text}), '{WORD_RE}', 0)")


def stopword_ratio_from(words_col: str) -> Column:
    """stopword_ratio over a pre-materialized words array column."""
    stops = ",".join(f"'{w}'" for w in STOPWORDS_EN)
    return F.expr(
        f"case when size({words_col}) = 0 then 0.0D "
        f"else cast(size(filter({words_col}, w -> w in ({stops}))) as double)"
        f" / size({words_col}) end"
    )


def quality_from(text: str, stop_col: str, punct_col: str) -> Column:
    """quality_score from pre-materialized ratio columns (same formula)."""
    len_ok = F.expr(
        f"case when length({text}) between 50 and 20000 then 1.0D else 0.0D end"
    )
    return F.round(
        0.5 * len_ok
        + 0.3 * (1 - F.least(F.col(punct_col) * 4, F.lit(1.0)))
        + 0.2 * F.least(F.col(stop_col) * 10, F.lit(1.0)),
        4,
    )


def lang_from(stop_col: str) -> Column:
    """lang_id from a pre-materialized stopword-ratio column."""
    return F.when(F.col(stop_col) > 0.03, F.lit("en")).otherwise(F.lit("unk"))


def fingerprint_from(words_col: str) -> Column:
    """fingerprint from a pre-materialized words array column."""
    return F.md5(F.array_join(F.col(words_col), " "))

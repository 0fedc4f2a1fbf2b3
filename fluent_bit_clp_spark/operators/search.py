"""Search over CLP-encoded tables — prune on the encoding, verify exactly.

The reference delegates search to CLP's own engine (reference
`README.md:20-21` points at the YScope log viewer); the CLP paper's core
trick is that a wildcard query compiles against the *logtype dictionary*,
so the fact scan prunes on one small column and never re-materializes
message text for non-matching rows.

Plan here (the classic prune + verify):

1. :func:`compile_relaxed_pattern` turns a ``*``-wildcard query into a
   regex over the **logtype** column.  Variable tokens in the query become
   the placeholder byte.  A token fragment adjacent to a ``*`` (e.g.
   ``container-*`` where the data token ``container-1a00…`` encodes as a
   variable) is ambiguous — it may survive as literal text or be swallowed
   into a placeholder — so it compiles to the alternation
   ``(?:fragment|PLACEHOLDER)``.  The pattern therefore *over*-selects,
   never under-selects.
2. Prune: filter the logtype dictionary with the pattern (tiny), broadcast
   semi-join the encoded table on ``logtype_id`` — or filter ``logtype``
   directly when no dictionary is supplied.
3. Verify: decode ONLY the pruned candidates and apply the exact wildcard
   regex to the reconstructed text.  Decode cost is confined to candidate
   rows — the pruning is what makes search on 100 TB viable.

Equality with naive regex over raw text is asserted in
tests/test_search.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_clp_spark.functions.clp_native import (
    MODE_I64,
    PLACEHOLDER,
    clp_decode_column,
)
from fluent_bit_clp_spark.functions.clp_pandas import _encode_one

_TOKEN_CHARS = r"[A-Za-z0-9_./+-]"
_TRAILING_FRAG = re.compile(f"{_TOKEN_CHARS}+$")
_LEADING_FRAG = re.compile(f"^{_TOKEN_CHARS}+")


def _relax(fragment: str) -> str:
    return f"(?:{re.escape(fragment)}|{re.escape(PLACEHOLDER)})"


def compile_relaxed_pattern(query: str) -> str:
    """``*``-wildcard query → over-selecting regex on the logtype column."""
    parts = query.split("*")
    out = []
    for i, part in enumerate(parts):
        logtype = _encode_one(part)[0]
        prefix = suffix = ""
        if i > 0:  # a '*' precedes this part: leading fragment is ambiguous
            m = _LEADING_FRAG.match(logtype)
            if m and PLACEHOLDER not in m.group(0):
                prefix = _relax(m.group(0))
                logtype = logtype[m.end():]
        if i < len(parts) - 1:  # a '*' follows: trailing fragment ambiguous
            m = _TRAILING_FRAG.search(logtype)
            if m and PLACEHOLDER not in m.group(0):
                suffix = _relax(m.group(0))
                logtype = logtype[: m.start()]
        if i > 0:
            out.append(".*")
        out.append(prefix + re.escape(logtype) + suffix)
    return "^" + "".join(out) + "$"


def exact_text_pattern(query: str) -> str:
    return "^" + ".*".join(re.escape(p) for p in query.split("*")) + "$"


def compile_var_predicates(query: str, mode: str = MODE_I64) -> list:
    """CLP-style sub-query enumeration, adapted: per-variable predicates.

    CLP proper enumerates every (var|literal) interpretation of each query
    token against its dictionaries (the paper's query compilation).  Our
    encoder is *deterministic* — a concrete token has exactly ONE data-side
    representation — so enumeration collapses to one predicate per token:

    - encoded int/float token → ``array_contains(encoded_vars, packed)``
    - dictionary token        → ``array_contains(dict_var_ids, xxh64(tok))``

    Only *unambiguous* tokens compile (not adjacent to a ``*``: a fragment
    like ``container-*`` may extend into a longer data token).  Soundness:
    any text matching :func:`exact_text_pattern` contains each concrete
    query part verbatim with its delimiters, so the same maximal token is
    extracted and identically classified — the predicates can only remove
    true negatives.  On concrete-value queries this prunes far below the
    logtype-only filter (no decode of rows whose variables can't match).

    ``mode`` MUST match the table's encode mode (i64 vs 4byte classify and
    pack tokens differently — a mismatched mode would silently drop true
    matches).
    """
    from fluent_bit_clp_spark.functions.clp_pandas import _xxh64_str

    parts = query.split("*")
    preds = []
    for i, part in enumerate(parts):
        core = part
        if i > 0:  # leading fragment touches a '*' — ambiguous, drop it
            m = _LEADING_FRAG.match(core)
            if m:
                core = core[m.end():]
        if i < len(parts) - 1:  # trailing fragment ambiguous
            m = _TRAILING_FRAG.search(core)
            if m:
                core = core[: m.start()]
        _, kinds, encs, dicts = _encode_one(core, mode)
        for k, e, d in zip(kinds or [], encs or [], dicts or []):
            if d is not None:
                preds.append(
                    F.array_contains("dict_var_ids", F.lit(_xxh64_str(d)))
                )
            else:
                preds.append(F.array_contains("encoded_vars", F.lit(e)))
    return preds


def logtype_matches(pattern: str, dictionary: DataFrame) -> DataFrame:
    return dictionary.where(F.col("logtype").rlike(pattern))


def search_encoded(
    encoded: DataFrame,
    query: str,
    dictionary: DataFrame | None = None,
    mode: str = MODE_I64,
) -> DataFrame:
    """Rows of the encoded table matching ``query``.

    Prune order: logtype pattern → per-variable predicates
    (:func:`compile_var_predicates` — concrete values prune on the
    encoded/dictionary columns, no decode) → decode-verify the survivors
    only (step 3 above).  ``mode`` must be the mode the table was encoded
    with (i64 default; pass "4byte" for FourByteEncoding tables — both
    the value predicates and the decode-verify depend on it)."""
    pattern = compile_relaxed_pattern(query)
    if dictionary is not None:
        ids = F.broadcast(logtype_matches(pattern, dictionary).select("logtype_id"))
        cand = encoded.join(ids, "logtype_id", "left_semi")
    else:
        cand = encoded.where(F.col("logtype").rlike(pattern))
    for pred in compile_var_predicates(query, mode):
        cand = cand.where(pred)
    verified = cand.withColumn("_decoded", clp_decode_column(mode=mode)).where(
        F.col("_decoded").rlike(exact_text_pattern(query))
    )
    return verified.drop("_decoded")

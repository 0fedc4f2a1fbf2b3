"""Grok-style named-pattern parsing, vectorized (north_star: "vectorized
grok/regex parsing of transcript text").

Fluent Bit's regex/grok parsers (and the wider Logstash ecosystem) let a
pipeline author write ``%{PATTERN:field}`` templates instead of raw
regex; the reference delegates raw-record parsing to Fluent Bit's parser
stage before the plugin sees records, so grok support is part of the
pipeline surface a Fluent Bit user expects even though the plugin code
itself never implements it (SURVEY.md §1.1: records arrive pre-parsed).

Design:

- :data:`GROK_PATTERNS` — the built-in pattern library, written in the
  PORTABLE regex dialect shared by Java regex (Spark), RE2 (DuckDB) and
  Python ``re`` (no lookarounds, no named groups, no shorthand classes
  that differ across engines), so every compiled grok expression is
  oracle-checkable verbatim.
- :func:`compile_grok` — ``"took %{NUMBER:ms} ms"`` → a single anchored-
  or-floating regex with one NUMBERED capture group per named field
  (named-group syntax differs between Java ``(?<n>)`` and RE2
  ``(?P<n>)``, so we track field → group index ourselves).
- :func:`grok_parse` — adds one column per named field via
  ``regexp_extract`` over the ONE compiled regex.  All JVM-side
  (whole-stage codegen), no Python in the row path; k fields cost k
  regex evaluations per row — acceptable for parse-stage field counts
  (the alternative, one pandas UDF returning a struct, trades that for
  Arrow transfer of the whole text column).

Unnamed uses (``%{INT}``) match without extracting, exactly like grok.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Portable pattern library.  Alternations and explicit classes only —
# identical semantics in Java regex, RE2, and Python re.  Non-capturing
# groups keep user field numbering stable.
GROK_PATTERNS: dict[str, str] = {
    "INT": "[+-]?[0-9]+",
    "POSINT": "[0-9]+",
    "NUMBER": "[+-]?[0-9]+(?:[.][0-9]+)?",
    "BASE16NUM": "(?:0[xX])?[0-9a-fA-F]+",
    "WORD": "[A-Za-z0-9_]+",
    "NOTSPACE": "[^ ]+",
    "DATA": ".*?",
    "GREEDYDATA": ".*",
    "IP": "(?:[0-9]{1,3}[.]){3}[0-9]{1,3}",
    "UNIXPATH": "(?:/[A-Za-z0-9._-]+)+",
    "LOGLEVEL": (
        "(?:[Tt][Rr][Aa][Cc][Ee]|[Dd][Ee][Bb][Uu][Gg]|[Ii][Nn][Ff][Oo]|"
        "[Ww][Aa][Rr][Nn](?:[Ii][Nn][Gg])?|[Ee][Rr][Rr][Oo][Rr]|"
        "[Ff][Aa][Tt][Aa][Ll]|[Cc][Rr][Ii][Tt][Ii][Cc][Aa][Ll])"
    ),
    "TIMESTAMP_ISO8601": (
        "[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}:[0-9]{2}"
        "(?:[.][0-9]+)?(?:Z|[+-][0-9]{2}:?[0-9]{2})?"
    ),
    "HTTPMETHOD": "(?:GET|POST|PUT|DELETE|PATCH|HEAD|OPTIONS)",
    "URIPATH": "(?:/[A-Za-z0-9._%+-]*)+",
}

# regex metacharacters in literal grok text get a backslash escape —
# same escape syntax in all three engines (the strings are passed as
# Python/DuckDB literals, never through Spark SQL string parsing, so the
# backslash survives verbatim on both sides)
_META = set(".^$*+?()[]{}|\\")

_TOKEN_RE = re.compile(
    "%\\{([A-Z0-9_]+)(?::([A-Za-z_][A-Za-z0-9_]*))?(?::([a-z]+))?\\}"
)

# Logstash-style type-conversion suffixes (%{INT:page:int}) → Spark cast
# targets.  Anything else after the second colon is rejected loudly.
_CAST_TYPES = {
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "bool": "boolean",
}


def _escape_literal(text: str) -> str:
    return "".join(("\\" + c) if c in _META else c for c in text)


def compile_grok(
    pattern: str, extra_patterns: dict[str, str] | None = None
) -> tuple[str, dict[str, int], dict[str, str]]:
    """``"%{WORD:verb} took %{NUMBER:ms:float} ms"`` →
    ``(regex, {"verb": 1, "ms": 2}, {"ms": "float"})``.

    Named fields become numbered capture groups (in template order);
    unnamed ``%{NAME}`` uses compile to non-capturing groups; the
    optional Logstash-style third segment (``:int``/``:long``/``:float``
    /``:double``/``:bool``) records a cast target applied by
    :func:`grok_parse`.  Unknown pattern names raise ``KeyError`` with
    the offending token; unknown cast types raise ``ValueError``.
    """
    lib = dict(GROK_PATTERNS)
    if extra_patterns:
        lib.update(extra_patterns)
    out: list[str] = []
    fields: dict[str, int] = {}
    casts: dict[str, str] = {}
    pos = 0
    group = 0
    for m in _TOKEN_RE.finditer(pattern):
        out.append(_escape_literal(pattern[pos : m.start()]))
        name, field, cast = m.group(1), m.group(2), m.group(3)
        if name not in lib:
            raise KeyError(f"unknown grok pattern %{{{name}}} in {pattern!r}")
        body = lib[name]
        if field:
            if field in fields:
                raise ValueError(f"duplicate grok field {field!r} in {pattern!r}")
            group += 1
            fields[field] = group
            out.append(f"({body})")
            if cast:
                if cast not in _CAST_TYPES:
                    raise ValueError(
                        f"unknown grok cast type {cast!r} in {pattern!r} "
                        f"(supported: {sorted(_CAST_TYPES)})"
                    )
                casts[field] = _CAST_TYPES[cast]
        else:
            # cast can't appear without a field: a lone ":xyz" segment is
            # consumed by the field group first, and "::xyz" fails the
            # token regex entirely (left as literal text)
            out.append(f"(?:{body})")
        pos = m.end()
    out.append(_escape_literal(pattern[pos:]))
    return "".join(out), fields, casts


def grok_match(text_col: str | Column, pattern: str) -> Column:
    """Boolean: does the compiled grok pattern match anywhere in the text
    (grok's default floating match — anchor explicitly with ``^``/``$``
    in the template if needed)."""
    rx, _, _ = compile_grok(pattern)
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return col.rlike(rx)


def grok_parse(
    df: DataFrame,
    text_col: str,
    pattern: str,
    prefix: str = "",
    keep_unmatched: bool = True,
    extra_patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Add one string column per named grok field (``prefix + field``).

    Non-matching rows get NULL in every field (Fluent Bit's parser
    semantics: an unparsed record keeps flowing with no extracted keys);
    ``keep_unmatched=False`` drops them instead.  Fields default to
    string; a ``%{INT:page:int}``-style suffix casts the extracted
    column (Logstash grok's type-conversion syntax).  A field whose
    output name collides with an existing column raises (review fix r4:
    ``withColumn`` would silently overwrite source data) — disambiguate
    with ``prefix``.
    """
    rx, fields, casts = compile_grok(pattern, extra_patterns)
    clashes = sorted(
        {prefix + f for f in fields} & set(df.columns)
    )
    if clashes:
        raise ValueError(
            f"grok fields would overwrite existing columns {clashes}; "
            "set prefix= to disambiguate"
        )
    col = F.col(text_col)
    matched = col.rlike(rx)
    out = df
    for field, idx in fields.items():
        extracted = F.when(matched, F.regexp_extract(col, rx, idx))
        if field in casts:
            extracted = extracted.cast(casts[field])
        out = out.withColumn(prefix + field, extracted)
    if not keep_unmatched:
        out = out.where(matched)
    return out

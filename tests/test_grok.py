"""Grok-style named-pattern parsing (operators/grok.py)."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fluent_bit_clp_spark.operators.grok import (
    GROK_PATTERNS,
    compile_grok,
    grok_match,
    grok_parse,
)


def test_compile_numbers_fields_in_template_order():
    rx, fields, casts = compile_grok("%{WORD:verb} took %{NUMBER:ms} ms")
    assert casts == {}
    assert fields == {"verb": 1, "ms": 2}
    m = re.search(rx, "fetch took 12.5 ms")
    assert m and m.group(1) == "fetch" and m.group(2) == "12.5"


def test_compile_escapes_literals_and_skips_unnamed():
    # '?' and '.' in literal text must not act as regex operators;
    # unnamed %{INT} matches without allocating a capture group
    rx, fields, _ = compile_grok("v%{INT}?q=%{WORD:q}.end")
    assert fields == {"q": 1}
    assert re.search(rx, "v7?q=x.end").group(1) == "x"
    assert re.search(rx, "v7Xq=xYend") is None


def test_compile_rejects_unknown_and_duplicate():
    with pytest.raises(KeyError, match="NOSUCH"):
        compile_grok("%{NOSUCH:x}")
    with pytest.raises(ValueError, match="duplicate"):
        compile_grok("%{INT:a} %{INT:a}")


def test_pattern_library_is_portable_syntax():
    """Every library pattern must compile in Python re AFTER reference
    expansion (a proxy for the shared Java/RE2/Python portable subset:
    no named groups, no lookbehind — those would raise here or diverge
    in RE2)."""
    for name in GROK_PATTERNS:
        rx, _, _ = compile_grok(f"%{{{name}}}")
        re.compile(rx)
        assert "(?P<" not in rx and "(?<" not in rx, name
        assert "(?=" not in rx and "(?!" not in rx, name


def test_nested_reference_expansion():
    """Library bodies may reference other patterns (Logstash's
    composition model): %{IPORHOST} expands through IPV6/IP/HOSTNAME."""
    rx, fields, _ = compile_grok("^%{IPORHOST:host}$")
    assert fields == {"host": 1}
    pat = re.compile(rx)
    for ok in ["10.0.0.1", "api-3.internal.example.com", "::1",
               "fe80::1ff:fe23:4567:890a"]:
        assert pat.match(ok), ok
    assert not pat.match("not a host!")


def test_reference_cycle_raises():
    with pytest.raises(ValueError, match="cycle"):
        compile_grok("%{A}", extra_patterns={"A": "x%{B}", "B": "%{A}y"})


APACHE_LINE = (
    '203.0.113.9 - frank [10/Oct/2000:13:55:36 -0700] '
    '"GET /apache_pb.gif?ref=1 HTTP/1.0" 200 2326 '
    '"http://www.example.com/start.html" "Mozilla/4.08 [en] (Win98)"'
)


def test_combined_apache_composite_fields_propagate():
    """A bare %{COMBINEDAPACHELOG} contributes the composite's named
    fields (and their casts) to the caller, numbered in '(' order."""
    rx, fields, casts = compile_grok("%{COMBINEDAPACHELOG}")
    assert list(fields) == [
        "clientip", "ident", "auth", "timestamp", "verb", "request",
        "httpversion", "rawrequest", "response", "bytes", "referrer",
        "agent",
    ]
    assert list(fields.values()) == list(range(1, 13))
    assert casts == {"response": "int", "bytes": "long"}
    m = re.search(rx, APACHE_LINE)
    assert m
    assert m.group(fields["clientip"]) == "203.0.113.9"
    assert m.group(fields["verb"]) == "GET"
    assert m.group(fields["response"]) == "200"
    assert m.group(fields["agent"]) == '"Mozilla/4.08 [en] (Win98)"'


def test_combined_apache_grok_parse_both_shapes(spark):
    """grok_parse extracts the 12 composite fields on Spark, single-pass
    and multi-pass byte-identical, casts applied ($10+ group references
    in the single-pass rewrite must resolve greedily, as Java does)."""
    df = spark.createDataFrame(
        [(APACHE_LINE,), ("malformed line",), (None,)], "text string"
    )
    rows = {}
    for sp in (True, False):
        out = grok_parse(df, "text", "%{COMBINEDAPACHELOG}", single_pass=sp)
        rows[sp] = [tuple(r) for r in out.orderBy(F.col("text").asc_nulls_first()).collect()]
    assert rows[True] == rows[False]
    good = [r for r in rows[True] if r[0] == APACHE_LINE][0]
    out_cols = grok_parse(df, "text", "%{COMBINEDAPACHELOG}").columns
    d = dict(zip(out_cols, good))
    assert d["clientip"] == "203.0.113.9"
    assert d["response"] == 200 and d["bytes"] == 2326
    # Spark's regexp_extract collapses non-participating groups to ''
    # (unlike Python re's None) — both execution shapes agree on it
    assert d["httpversion"] == "1.0" and d["rawrequest"] == ""
    bad = [r for r in rows[True] if r[0] == "malformed line"][0]
    assert all(v is None for v in bad[1:])


def test_grok_parse_extracts_and_nulls_unmatched(spark):
    df = spark.createDataFrame(
        [
            (0, "GET /api/v2/users/17?page=3 took 4.25 ms"),
            (1, "cache warmed and ready to serve traffic"),
        ],
        "id int, text string",
    )
    pat = "%{HTTPMETHOD:verb} %{URIPATH:path}?page=%{INT:page} took %{NUMBER:ms} ms"
    out = {r.id: r for r in grok_parse(df, "text", pat).collect()}
    assert out[0].verb == "GET"
    assert out[0].path == "/api/v2/users/17"
    assert out[0].page == "3" and out[0].ms == "4.25"
    assert out[1].verb is None and out[1].ms is None  # unmatched → NULL
    assert grok_parse(df, "text", pat, keep_unmatched=False).count() == 1
    assert df.where(grok_match("text", pat)).count() == 1


def test_grok_parse_prefix_and_extra_patterns(spark):
    df = spark.createDataFrame([(0, "conn ab12cd34 up")], "id int, text string")
    out = grok_parse(
        df,
        "text",
        "conn %{CONNID:cid} up",
        prefix="g_",
        extra_patterns={"CONNID": "[0-9a-f]{8}"},
    ).collect()[0]
    assert out.g_cid == "ab12cd34"


def test_loglevel_alternation_case_insensitive(spark):
    df = spark.createDataFrame(
        [(0, "level=WARN x"), (1, "level=warning x"), (2, "level=noise x")],
        "id int, text string",
    )
    out = {
        r.id: r.level
        for r in grok_parse(df, "text", "level=%{LOGLEVEL:level} x").collect()
    }
    assert out[0] == "WARN" and out[1] == "warning" and out[2] is None


def test_grok_on_generated_transcripts_matches_python_re(spark):
    """The compiled regex must behave identically JVM-side and in Python
    re over real generated text (the portability contract the DuckDB
    oracle also leans on)."""
    from fluent_bit_clp_spark.datagen import transcripts

    pat = "%{HTTPMETHOD:verb} %{URIPATH:path}?page=%{INT:page} took %{NUMBER:ms} ms"
    rx, fields, _ = compile_grok(pat)
    df = transcripts(spark, 500, with_edge_rows=False)
    rows = df.select("text").collect()
    spark_hits = (
        grok_parse(df, "text", pat, keep_unmatched=False)
        .select("verb", "path", "page", "ms")
        .collect()
    )
    py_hits = [m for r in rows if (m := re.search(rx, r.text))]
    assert len(spark_hits) == len(py_hits) > 0
    assert sorted((h.verb, h.path, h.page, h.ms) for h in spark_hits) == sorted(
        (m.group(1), m.group(2), m.group(3), m.group(4)) for m in py_hits
    )


def test_grok_parse_rejects_column_collision(spark):
    """Review fix r4: a grok field colliding with an existing column must
    raise instead of silently overwriting source data."""
    df = spark.createDataFrame(
        [(0, "GET /x?page=1 took 2 ms", "/keep/me")],
        "id int, text string, path string",
    )
    pat = "%{HTTPMETHOD:verb} %{URIPATH:path}?page=%{INT:page} took %{NUMBER:ms} ms"
    with pytest.raises(ValueError, match="overwrite existing columns"):
        grok_parse(df, "text", pat)
    out = grok_parse(df, "text", pat, prefix="g_").collect()[0]
    assert out.path == "/keep/me" and out.g_path == "/x"


def test_single_pass_equals_multipass_even_on_separator_collision(spark):
    """The single-pass rewrite joins groups with a control-char separator;
    a group VALUE containing that exact sequence must be detected (split
    yields > k parts) and fall back to per-group extraction — results
    identical to single_pass=False on every row."""
    from fluent_bit_clp_spark.operators.grok import _SP_SEP

    df = spark.createDataFrame(
        [
            (0, "GET /api/v2/users/17?page=3 took 4.25 ms tail"),
            (1, "no match at all"),
            # adversarial: the free-text group contains the separator
            (2, f"job j-1 said evil{_SP_SEP}payload end"),
            (3, "job j-2 said ok end"),
        ],
        "id int, text string",
    )
    pats = [
        "%{HTTPMETHOD:verb} %{URIPATH:path}?page=%{INT:page:int} took "
        "%{NUMBER:ms:double} ms %{GREEDYDATA:rest}",
        "job %{NOTSPACE:jid} said %{DATA:msg} end",
    ]
    for pat in pats:
        fast = grok_parse(df, "text", pat, single_pass=True)
        slow = grok_parse(df, "text", pat, single_pass=False)
        assert fast.schema == slow.schema
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, slow.collect())
        )
    got = {
        r.id: r.msg
        for r in grok_parse(df, "text", pats[1]).collect()
    }
    assert got[2] == f"evil{_SP_SEP}payload" and got[3] == "ok"


def test_single_pass_plan_runs_regex_once(spark):
    """VERDICT r4 #3 'done' bar: ONE regex evaluation per row in the plan
    — exactly one regexp_replace, shared by all k field projections (the
    per-group regexp_extract appears only inside the lazy fallback CASE
    branches, never as the primary path)."""
    df = spark.createDataFrame(
        [(0, "GET /x?page=1 took 2 ms extra")], "id int, text string"
    )
    pat = (
        "%{HTTPMETHOD:verb} %{URIPATH:path}?page=%{INT:page} took "
        "%{NUMBER:ms} ms %{GREEDYDATA:rest}"
    )
    out = grok_parse(df, "text", pat)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_replace") == 1
    old = grok_parse(df, "text", pat, single_pass=False)
    old_plan = old._jdf.queryExecution().executedPlan().toString()
    assert old_plan.count("regexp_replace") == 0  # the shape we replaced


def test_grok_type_cast_suffix(spark):
    """Logstash grok type conversion: %{INT:page:int} casts the
    extracted column; unmatched rows stay NULL in the cast type."""
    df = spark.createDataFrame(
        [(0, "GET /x?page=3 took 4.25 ms"), (1, "no match here")],
        "id int, text string",
    )
    pat = "%{HTTPMETHOD:verb} %{URIPATH:path}?page=%{INT:page:int} took %{NUMBER:ms:double} ms"
    out = grok_parse(df, "text", pat)
    types = dict(out.dtypes)
    assert types["page"] == "int" and types["ms"] == "double"
    rows = {r.id: r for r in out.collect()}
    assert rows[0].page == 3 and abs(rows[0].ms - 4.25) < 1e-9
    assert rows[1].page is None and rows[1].ms is None
    with pytest.raises(ValueError, match="unknown grok cast"):
        compile_grok("%{INT:n:decimal}")


def test_single_pass_dotall_does_not_leak_into_user_pattern(spark):
    """Review fix r5: the single-pass wrapper's dotall must be scoped to
    its own .* legs — a global (?s) made DATA/GREEDYDATA span newlines
    in single-pass mode only, diverging from regexp_extract."""
    df = spark.createDataFrame(
        [("job A said hello\nworld end",)], "text string"
    )
    pat = "job %{NOTSPACE:jid} said %{GREEDYDATA:msg}"
    fast = grok_parse(df, "text", pat, single_pass=True).collect()[0]
    slow = grok_parse(df, "text", pat, single_pass=False).collect()[0]
    assert fast.msg == slow.msg == "hello"


def test_single_pass_partial_separator_overlap(spark):
    """Review fix r5: a group value ENDING in a separator-byte prefix
    merges with the inserted separator, keeping the part count at k —
    part-count detection alone corrupted two fields; any row containing
    a separator byte must take the exact fallback."""
    df = spark.createDataFrame(
        [("job A said B\x00\x1d end C",), ("job X said Y end Z",)],
        "text string",
    )
    pat = "job %{NOTSPACE:jid} said %{DATA:msg} end %{NOTSPACE:tag}"
    fast = {r.text: (r.msg, r.tag)
            for r in grok_parse(df, "text", pat, single_pass=True).collect()}
    slow = {r.text: (r.msg, r.tag)
            for r in grok_parse(df, "text", pat, single_pass=False).collect()}
    assert fast == slow
    assert fast["job A said B\x00\x1d end C"] == ("B\x00\x1d", "C")


def test_grok_temp_columns_guarded(spark):
    df = spark.createDataFrame([("a 1 b", "x")],
                               "text string, _grok_parts string")
    with pytest.raises(ValueError, match="_grok_parts"):
        grok_parse(df, "text", "a %{INT:n} %{WORD:w}")


def test_grok_temp_clash_only_when_single_pass_runs(spark):
    """Advice fix r5: _grok_m/_grok_parts only exist on the single-pass
    branch (single_pass=True and k>=2) — a single-field call or an
    explicit single_pass=False must process such a frame fine."""
    df = spark.createDataFrame([("a 1 b", "x")],
                               "text string, _grok_parts string")
    assert grok_parse(df, "text", "a %{INT:n}").collect()[0].n == "1"
    row = grok_parse(
        df, "text", "a %{INT:n} %{WORD:w}", single_pass=False
    ).collect()[0]
    assert (row.n, row.w) == ("1", "b")


def test_compile_bare_dollar_anchor():
    """Advice fix r5: a pattern of exactly '$' compiles to the anchor
    alone, not '\\$$' (the old `or None` slice kept '$' as body text)."""
    rx, fields, _ = compile_grok("$")
    assert rx == "$" and fields == {}
    assert re.search(rx, "anything") is not None
    rx2, _, _ = compile_grok("^$")
    assert rx2 == "^$"
    assert re.fullmatch(rx2, "") is not None and re.search(rx2, "x") is None


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=0, max_codepoint=0x7E),
            max_size=80,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_single_pass_equals_multipass_property(spark, texts):
    """Property sweep of the single-pass/multi-pass equivalence over
    arbitrary ASCII+control text (newlines, separator bytes, partial
    separators — the space both review-found divergences lived in)."""
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    pat = "job %{NOTSPACE:jid} said %{DATA:msg} end %{NOTSPACE:tag}"
    fast = [tuple(r) for r in grok_parse(df, "text", pat, single_pass=True)
            .orderBy(F.col("text").asc_nulls_first()).collect()]
    slow = [tuple(r) for r in grok_parse(df, "text", pat, single_pass=False)
            .orderBy(F.col("text").asc_nulls_first()).collect()]
    assert fast == slow


def test_syslogline_composite(spark):
    df = spark.createDataFrame(
        [("Oct  7 12:01:44 web-3.example.com crond[1234]: starting job 7",),
         ("Oct 17 02:59:01 10.0.0.5 kernel: out of memory",)],
        "text string",
    )
    out = {r.logsource: r for r in
           grok_parse(df, "text", "%{SYSLOGLINE}").collect()}
    a = out["web-3.example.com"]
    assert a.program == "crond" and a.pid == 1234
    assert a.message == "starting job 7"
    b = out["10.0.0.5"]
    assert b.program == "kernel" and b.pid is None
    assert b.message == "out of memory"

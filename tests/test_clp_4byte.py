"""CLP four-byte encoding mode: classification bounds, property packing,
twin-implementation equality, and the 4-byte IR wire round-trip.

Parity target: the reference's standard stream encoding
(`ir.NewWriter[ir.FourByteEncoding]`, internal/irzstd/writer.go:100-113,
ingestion.go:66-67) — ints must fit int32, floats must satisfy the
25-bit/8-digit property bounds, everything else falls back to the
dictionary (functions/clp_native.py module docstring)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fluent_bit_clp_spark.functions.clp_native import (
    KIND_DICT,
    KIND_FLOAT,
    KIND_INT,
    MODE_4BYTE,
    clp_decode_column,
    clp_encode,
)
from fluent_bit_clp_spark.functions.clp_pandas import (
    _encode_one,
    _decode_one,
    _pack_float4,
    _unpack_float4,
)

# token → expected 4-byte kind
CASES = [
    ("2147483647", KIND_INT),       # int32 max
    ("-2147483648", KIND_INT),      # int32 min
    ("2147483648", KIND_DICT),      # int32 max + 1
    ("-2147483649", KIND_DICT),
    ("007", KIND_DICT),             # leading zeros never round-trip
    ("-0", KIND_DICT),
    ("0", KIND_INT),
    ("1.25", KIND_FLOAT),
    ("0.1234567", KIND_FLOAT),      # 8 digits, value 1234567 < 2^25
    ("335544.31", KIND_FLOAT),      # digit value 33554431 == 2^25 - 1
    ("335544.32", KIND_DICT),       # digit value 33554432 == 2^25
    ("9.9999999", KIND_DICT),       # 99999999 > 2^25 - 1
    ("123456789.0", KIND_DICT),     # 10 digits > 8
    ("0.50", KIND_FLOAT),           # trailing zero preserved
    ("deadbeef42", KIND_DICT),
]


def test_4byte_classification_python():
    for tok, want in CASES:
        _, kinds, _, _ = _encode_one(f"x {tok} y", MODE_4BYTE)
        assert kinds == [want], tok


def test_4byte_float_pack_unpack_exact():
    for tok in ["1.25", "0.1234567", "335544.31", "0.50", "-0.001", "-335544.31"]:
        p = _pack_float4(tok)
        assert 0 <= p < (1 << 32), tok  # fits four bytes
        assert _unpack_float4(p) == tok


@settings(max_examples=200, deadline=None)
@given(
    st.booleans(),
    st.integers(0, 33554431),
    st.integers(1, 8),
)
def test_4byte_float_property_roundtrip(neg, value, nd_total):
    digits = str(value).zfill(nd_total)
    if len(digits) > nd_total:
        digits = digits[:nd_total]
        value = int(digits)
    for pos in range(1, nd_total):
        tok = ("-" if neg else "") + digits[:-pos] + "." + digits[-pos:]
        # skip shapes our grammar classifies as dict (leading-zero int part)
        _, kinds, encs, _ = _encode_one(tok, MODE_4BYTE)
        if kinds == [KIND_FLOAT]:
            assert _unpack_float4(encs[0]) == tok


def test_4byte_native_equals_pandas(spark):
    toks = " ".join(t for t, _ in CASES)
    texts = [toks, "plain words", "", None, "v1.2.3 -0.5 00.5 1e9 0x1F"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    nat = clp_encode(df, mode=MODE_4BYTE).select(
        "text", "logtype", "var_kinds", "encoded_vars", "dict_vars"
    )
    rows = nat.collect()
    for r in rows:
        lt, kinds, encs, dicts = _encode_one(r.text, MODE_4BYTE)
        assert r.logtype == lt, r.text
        assert (r.var_kinds or None) == (kinds or None) or list(r.var_kinds) == kinds
        assert (list(r.encoded_vars) if r.encoded_vars is not None else None) == encs
        assert (list(r.dict_vars) if r.dict_vars is not None else None) == dicts


def test_4byte_roundtrip_native_and_pandas(spark):
    texts = [
        "user 42 paid 13.37 at t=1700000000 id deadbeef42",
        "big 99999999999 and tiny -0.0001 and edge 2147483647",
        "floats 335544.31 335544.32 0.50 007",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    enc = clp_encode(df, mode=MODE_4BYTE)
    dec = enc.withColumn("dec", clp_decode_column(mode=MODE_4BYTE))
    for r in dec.select("text", "dec").collect():
        assert r.dec == r.text
    # pandas twin decode agrees
    for r in enc.collect():
        got = _decode_one(
            r.logtype, list(r.var_kinds), list(r.encoded_vars),
            list(r.dict_vars), MODE_4BYTE,
        )
        assert got == r.text


def test_4byte_encoded_values_fit_four_bytes(spark):
    df = spark.createDataFrame(
        [("a -2147483648 b 2147483647 c 335544.31 d -0.001",)], "text string"
    )
    r = clp_encode(df, mode=MODE_4BYTE).select("var_kinds", "encoded_vars").collect()[0]
    for k, v in zip(r.var_kinds, r.encoded_vars):
        if k == KIND_INT:
            assert -(1 << 31) <= v < (1 << 31)
        elif k == KIND_FLOAT:
            assert 0 <= v < (1 << 32)


def test_ir_stream_4byte_wire(spark):
    """IR blobs in 4-byte mode: every encoded var costs exactly 4 payload
    bytes; decode reproduces the original text; ts_ms None and -1 are
    distinguishable (explicit flag byte, ADVICE r1 fix)."""
    from fluent_bit_clp_spark.operators.irstream import (
        read_ir_chunk,
        write_ir_chunks,
    )
    from fluent_bit_clp_spark.functions.clp_pandas import clp_encode_pandas

    rows = [
        ("c1", 0, "user 42 paid 13.37 ok", -1),       # genuine ts of -1 ms
        ("c1", 1, "x 2147483647 y 335544.31", None),  # null ts
        ("c2", 0, "hash deadbeef42 v1.2.3", 1700000000123),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts_ms long"
    ).withColumn("sink", F.lit("s")).withColumn("chunk_id", F.lit(0))
    enc = clp_encode_pandas(df, mode=MODE_4BYTE)
    chunks = write_ir_chunks(enc, encoding="4byte").collect()
    assert len(chunks) == 1
    evs = read_ir_chunk(bytes(chunks[0].ir_zstd))
    by_ts = {}
    for ev in evs:
        text = _decode_one(
            ev["logtype"], ev["var_kinds"], ev["encoded_vars"],
            ev["dict_vars"], MODE_4BYTE,
        )
        by_ts[text] = ev["ts_ms"]
    assert by_ts["user 42 paid 13.37 ok"] == -1      # not nulled
    assert by_ts["x 2147483647 y 335544.31"] is None  # not -1
    assert by_ts["hash deadbeef42 v1.2.3"] == 1700000000123


def test_search_in_4byte_mode(spark):
    """search_encoded(mode='4byte') must find matches in 4-byte tables —
    the i64-packed predicate would silently drop them (review fix)."""
    from fluent_bit_clp_spark.operators.search import search_encoded

    rows = [(i, f"temp {i}.5 ok") for i in range(100)]
    df = spark.createDataFrame(rows, "id int, text string")
    enc = clp_encode(df, mode=MODE_4BYTE)
    hits = search_encoded(enc, "temp 7.5 ok", mode=MODE_4BYTE)
    assert [r.id for r in hits.collect()] == [7]
    # big ints classify as dict in 4-byte mode; predicate must follow
    rows2 = [(i, f"span {9999999999 + i} end") for i in range(50)]
    enc2 = clp_encode(
        spark.createDataFrame(rows2, "id int, text string"), mode=MODE_4BYTE
    )
    hits2 = search_encoded(enc2, "span 10000000003 end", mode=MODE_4BYTE)
    assert [r.id for r in hits2.collect()] == [4]

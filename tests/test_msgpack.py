"""Msgpack source: byte-golden fixtures for all four reference wire forms
(`internal/decoder/decoder.go:30-36,105-176`, v2 uint64-ms
`out_clp_s3_v2.go:285-295`, v1 uint64-s `flush/flush.go:122-134`), the
malformed-record drop-and-count policy, and the Spark mapInPandas surface.

Fixture bytes are handwritten per the public msgpack spec — NOT produced
by our encoder — so decode correctness is pinned against the format, not
against our own code.
"""

import struct

from fluent_bit_clp_spark.sources.msgpack import (
    decode_msgpack_chunks,
    encode_record,
    iter_records,
    read_msgpack_files,
)

# --- handcrafted wire bytes -------------------------------------------------

SEC, NSEC = 1_700_000_000, 123_000_000  # → 1700000000123 ms
MS = SEC * 1000 + NSEC // 1_000_000

# fixext8(type=0, BE sec, BE nsec)
FIXEXT8_TS = b"\xd7\x00" + struct.pack(">II", SEC, NSEC)
# {"log": "hello"} : fixmap(1) + fixstr"log" + fixstr"hello"
RECORD = b"\x81\xa3log\xa5hello"
RECORD_JSON = '{"log":"hello"}'

V1_FIXEXT = b"\x92" + FIXEXT8_TS + RECORD  # [FlbTime, record]
V1_UINT_S = b"\x92\xcf" + struct.pack(">Q", SEC) + RECORD  # [uint64 s, record]
V2_UINT_MS = b"\x92\xcf" + struct.pack(">Q", MS) + RECORD  # [uint64 ms, record]
# [[FlbTime, {}], record] — v2 metadata layout
V2_META = b"\x92\x92" + FIXEXT8_TS + b"\x80" + RECORD


def test_v1_fixext_flbtime():
    assert list(iter_records(V1_FIXEXT, "v1")) == [(MS, RECORD_JSON, False)]
    # FlbTime decode is mode-independent
    assert list(iter_records(V1_FIXEXT, "v2")) == [(MS, RECORD_JSON, False)]


def test_v1_uint64_seconds():
    assert list(iter_records(V1_UINT_S, "v1")) == [
        (SEC * 1000, RECORD_JSON, False)
    ]


def test_v2_uint64_millis():
    assert list(iter_records(V2_UINT_MS, "v2")) == [(MS, RECORD_JSON, False)]


def test_v2_metadata_layout():
    assert list(iter_records(V2_META, "v2")) == [(MS, RECORD_JSON, False)]


def test_multi_record_stream():
    blob = V2_UINT_MS + V2_META + V1_FIXEXT
    out = list(iter_records(blob, "v2"))
    assert [r[0] for r in out] == [MS, MS, MS]
    assert all(not r[2] for r in out)


def test_malformed_short_metadata_array():
    # [[FlbTime], record] — inner array below minMetadataLen (decoder.go:114)
    blob = b"\x92\x91" + FIXEXT8_TS + RECORD + V2_UINT_MS
    out = list(iter_records(blob, "v2"))
    assert out[0] == (None, None, True)
    assert out[1] == (MS, RECORD_JSON, False)  # stream continues


def test_malformed_not_a_pair():
    # fixarray(1) containing just a record — wrong arity
    blob = b"\x91" + RECORD + V2_UINT_MS
    out = list(iter_records(blob, "v2"))
    assert out[0] == (None, None, True)
    assert out[1][2] is False


def test_malformed_bad_ts_type_keeps_record():
    # ["x", record]: unrecognized ts type → null ts + flagged, record kept
    # (we deviate from the reference's wall-clock substitution on purpose)
    blob = b"\x92\xa1x" + RECORD
    assert list(iter_records(blob, "v2")) == [(None, RECORD_JSON, True)]


def test_truncated_stream_aborts_with_flag():
    blob = V2_UINT_MS + V2_META[: len(V2_META) // 2]
    out = list(iter_records(blob, "v2"))
    assert out[0][2] is False
    assert out[-1] == (None, None, True)


def test_record_json_sorted_keys_nested():
    # map keys must serialize sorted (Go json.Marshal semantics)
    rec = b"\x82\xa1b\x01\xa1a\x92\xc3\xcb" + struct.pack(">d", 1.5)
    blob = b"\x92\xcf" + struct.pack(">Q", MS) + rec
    assert list(iter_records(blob, "v2")) == [
        (MS, '{"a":[true,1.5],"b":1}', False)
    ]


def test_encoder_roundtrip_all_layouts():
    for layout in ("v1_fixext", "v1_uint_s", "v2_uint_ms", "v2_meta"):
        mode = "v1" if layout == "v1_uint_s" else "v2"
        blob = encode_record(MS, {"log": "hello"}, layout)
        (ts_ms, rec, bad) = next(iter(iter_records(blob, mode)))
        want = (MS // 1000) * 1000 if layout == "v1_uint_s" else MS
        assert (ts_ms, rec, bad) == (want, RECORD_JSON, False), layout


def test_spark_decode_chunks(spark):
    rows = [("c0", V2_UINT_MS + V2_META), ("c1", V1_FIXEXT), ("c2", None)]
    df = spark.createDataFrame(rows, "src string, content binary")
    out = decode_msgpack_chunks(df, "v2").collect()
    got = {(r.src, r.rec_idx): (r.ts_ms, r.record_json, r.malformed) for r in out}
    assert got[("c0", 0)] == (MS, RECORD_JSON, False)
    assert got[("c0", 1)] == (MS, RECORD_JSON, False)
    assert got[("c1", 0)] == (MS, RECORD_JSON, False)
    assert got[("c2", 0)] == (None, None, True)


def test_spark_read_msgpack_files(spark, tmp_path):
    d = tmp_path / "chunks"
    d.mkdir()
    (d / "a.msgpack").write_bytes(V2_UINT_MS)
    (d / "b.msgpack").write_bytes(V2_META + V1_FIXEXT)
    out = read_msgpack_files(spark, str(d), "v2")
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.ts_ms == MS and not r.malformed for r in rows)


# --- property-based round-trip (hypothesis) --------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
)
_json_vals = st.recursive(
    _scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=4),
        st.dictionaries(st.text(max_size=8), kids, max_size=4),
    ),
    max_leaves=12,
)


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=(2**31 - 1) * 1000),
    st.dictionaries(st.text(max_size=8), _json_vals, max_size=4),
    st.sampled_from(["v1_fixext", "v2_uint_ms", "v2_meta"]),
)
def test_property_roundtrip_arbitrary_records(ts_ms, record, layout):
    """Any JSON-able record survives encode→decode with the exact ts and
    Go-style sorted-key JSON rendering."""
    import json

    blob = encode_record(ts_ms, record, layout)
    (got_ts, got_json, bad) = next(iter(iter_records(blob, "v2")))
    assert not bad
    assert got_ts == ts_ms
    assert got_json == json.dumps(
        record, sort_keys=True, separators=(",", ":"), ensure_ascii=False
    )


def test_msgpack_to_pipeline_end_to_end(spark, tmp_path):
    """Full integration: msgpack chunk files → decode → single-key message
    extraction → encode pipeline → per-sink output, with round-trip text
    equality and the malformed record surfacing as an encode failure."""
    import json
    import os

    from pyspark.sql import functions as F

    from fluent_bit_clp_spark.functions.clp_native import clp_decode_column
    from fluent_bit_clp_spark.plans.pipeline import run_to_sinks
    from fluent_bit_clp_spark.sources.msgpack import (
        msgpack_to_transcripts,
        read_msgpack_files,
    )

    d = tmp_path / "chunks"
    d.mkdir()
    msgs = [f"level=warn worker {i} took {i * 1.5:.1f} ms" for i in range(20)]
    blob = b"".join(
        encode_record(1_700_000_000_000 + i, {"log": m, "file_path": "/var/log/x"})
        for i, m in enumerate(msgs)
    )
    (d / "a.msgpack").write_bytes(blob)
    # second chunk: one record whose ts type is bogus (null ts → failure)
    (d / "b.msgpack").write_bytes(
        b"\x92\xa1x" + b"\x81\xa3log\xa2ok"
    )
    decoded = read_msgpack_files(spark, str(d), "v2")
    transcripts = msgpack_to_transcripts(decoded)
    out = str(tmp_path / "out")
    res = run_to_sinks(spark, transcripts, out, "run-mp")
    assert res["ingest"]["num_events"] == 21
    assert res["ingest"]["encode_failures"] == 1  # the null-ts record
    back = spark.read.parquet(os.path.join(out, "sinks"))
    assert set(r.sink for r in back.select("sink").distinct().collect()) == {"ops"}
    dec = back.withColumn("t", clp_decode_column())
    got = sorted(
        r.t for r in dec.where(F.col("conv_id").like("%a.msgpack")).collect()
    )
    assert got == sorted(msgs)
    # level extraction saw 'level=warn' (LEVEL_WARN == 3)
    assert back.where(F.col("level_id") == 3).count() == 20


def test_adversarial_deep_nesting_is_malformed_row():
    """Thousands of nested fixarrays must degrade to one malformed row,
    not a RecursionError escaping the task (round-2 review fix)."""
    blob = b"\x91" * 3000 + b"\xc0"
    assert list(iter_records(blob, "v2")) == [(None, None, True)]


def test_uint64_ts_beyond_int64_is_malformed():
    """A uint64 ts >= 2^63 (legal msgpack) must flag, not overflow the
    Arrow bigint column."""
    blob = b"\x92\xcf" + struct.pack(">Q", 1 << 63) + RECORD
    assert list(iter_records(blob, "v2")) == [(None, RECORD_JSON, True)]
    # v1 multiply-overflow path too
    blob = b"\x92\xcf" + struct.pack(">Q", (1 << 62)) + RECORD
    assert list(iter_records(blob, "v1")) == [(None, RECORD_JSON, True)]


def test_nonfinite_float_record_is_malformed():
    """NaN/Inf floats are legal msgpack but invalid JSON; Go json.Marshal
    errors and the reference drops the record (decoder.go:166-172) — we
    flag the row malformed instead of emitting unparseable 'NaN' text
    (ADVICE r2)."""
    for word in (float("nan"), float("inf"), float("-inf")):
        rec = b"\x81\xa1k\xcb" + struct.pack(">d", word)  # {'k': nan/inf}
        blob = b"\x92\xcf" + struct.pack(">Q", MS) + rec
        assert list(iter_records(blob, "v2")) == [(None, None, True)]


def test_bin_typed_map_key_decodes_as_string():
    """RawToString analogue covers bin-typed keys: b'log' renders as
    JSON key "log", not "b'log'"."""
    rec = b"\x81\xc4\x03log\xa5hello"  # {bin8 'log': 'hello'}
    blob = b"\x92\xcf" + struct.pack(">Q", MS) + rec
    assert list(iter_records(blob, "v2")) == [(MS, RECORD_JSON, False)]


@settings(max_examples=120, deadline=None)
@given(
    st.dictionaries(
        st.text(max_size=64),  # >31-char keys hit the str8 non-fixstr-key
        # bail → generic replay; short keys stay on the fused emitter
        st.one_of(
            st.text(max_size=300),  # str8/str16 values, escapes included
            st.integers(min_value=-(2**63), max_value=2**64 - 1),
            st.floats(allow_nan=False, allow_infinity=False),
            st.lists(st.text(max_size=40), max_size=3),
        ),
        max_size=6,
    )
)
def test_fused_emitter_differential(record):
    """The fused decode→JSON emitter must render byte-identically to
    json.dumps(sort_keys, compact, ensure_ascii=False) across marker
    widths (fixstr/str8/str16), escape-needing text, and the bail→replay
    boundary (non-fixstr map keys)."""
    import json

    blob = encode_record(1_700_000_000_123, record, "v2_uint_ms")
    (_, got_json, bad) = next(iter(iter_records(blob, "v2")))
    assert not bad
    assert got_json == json.dumps(
        record, sort_keys=True, separators=(",", ":"), ensure_ascii=False
    )


def test_fused_emitter_bails_to_generic_on_bin_and_ext():
    """bin/ext values inside a record aren't fused — the record replays
    through the generic path: bin → utf-8 string, foreign ext → null
    (decoder RawToString / unknown-ext policy), same as before round 6."""
    # {"b": bin8"xy", "e": fixext1(7), "k": "v"}
    rec = (b"\x83\xa1b\xc4\x02xy"
           b"\xa1e\xd4\x07\x00"
           b"\xa1k\xa1v")
    blob = b"\x92\xcf" + struct.pack(">Q", MS) + rec
    assert list(iter_records(blob, "v2")) == [
        (MS, '{"b":"xy","e":null,"k":"v"}', False)
    ]


def test_fused_emitter_duplicate_keys_keep_last():
    """Duplicate map keys keep the LAST value (dict semantics), fused and
    generic paths alike."""
    # {"k": "a", "k": "b"} on the wire
    rec = b"\x82\xa1k\xa1a\xa1k\xa1b"
    blob = b"\x92\xcf" + struct.pack(">Q", MS) + rec
    assert list(iter_records(blob, "v2")) == [(MS, '{"k":"b"}', False)]

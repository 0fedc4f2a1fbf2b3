"""End-to-end streaming pipeline (VERDICT r4 #5): one continuous chain
msgpack chunk tail → wire decode → transcript shape → enrich/route →
CLP encode → checkpointed per-sink sink, plus the dual-timer flush →
overwrite-sync leg riding the same decoded stream — the reference's full
v2 hot path (`out_clp_s3_v2.go:159-185` → `ingestion.go:110-127`)
composed end-to-end instead of surface-by-surface.

The gate: with availableNow triggers, the streaming sink contents must
EQUAL the batch pipeline's output on the same chunk files.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from fluent_bit_clp_spark.functions.clp_pandas import clp_encode_pandas
from fluent_bit_clp_spark.operators.enrich import enrich
from fluent_bit_clp_spark.operators.route import with_sink
from fluent_bit_clp_spark.sources.msgpack import (
    encode_record,
    read_msgpack_files,
    msgpack_to_transcripts,
    stream_msgpack_files,
)
from fluent_bit_clp_spark.streaming.flush import stream_encode_to_sinks


BASE_MS = 1_767_225_600_000  # 2026-01-01T00:00:00Z


@pytest.fixture()
def chunk_dir(tmp_path):
    """Three msgpack chunk files, realistic variable-bearing lines, one
    record without the single key (whole-record fallback path)."""
    d = tmp_path / "chunks"
    d.mkdir()
    lvl = ["info", "error", "warn"]
    for c in range(3):
        recs = []
        for i in range(40):
            # 10 s apart: far past the 3 s soft delta, so every event
            # closes the previous dual-timer batch deterministically
            ts = BASE_MS + (c * 40 + i) * 10_000
            recs.append(
                encode_record(ts, {
                    "log": f"level={lvl[i % 3]} user u{i} fetched "
                           f"/api/v1/items/{c * 40 + i} in {i % 50}.{i % 10} ms",
                    "k": i,
                })
            )
        # fallback record: no 'log' key → whole-record JSON as message
        recs.append(encode_record(BASE_MS + 10_000_000 + c, {"event": "x", "n": c}))
        (d / f"chunk-{c}.msgpack").write_bytes(b"".join(recs))
    return str(d)


def _encode_chain(tr, spark):
    """The transform stream_encode_to_sinks applies — shared verbatim so
    the batch reference is the same code path minus the stream."""
    return clp_encode_pandas(with_sink(enrich(tr, spark)))


def _rows(df):
    cols = sorted(df.columns)
    return sorted(df.select(*cols).toJSON().collect())


def test_stream_pipeline_equals_batch_pipeline(spark, tmp_path, chunk_dir):
    """msgpack tail → decode → encode → per-sink sink, availableNow; the
    committed sink parquet must equal the batch pipeline's rows exactly."""
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    stream_tr = msgpack_to_transcripts(stream_msgpack_files(spark, chunk_dir))
    q = stream_encode_to_sinks(stream_tr, ck, out, spark).start()
    q.awaitTermination(120)

    batch_tr = msgpack_to_transcripts(read_msgpack_files(spark, chunk_dir))
    want = _encode_chain(batch_tr, spark)

    got = spark.read.parquet(out)
    assert sorted(got.columns) == sorted(want.columns)
    assert _rows(got) == _rows(want)
    assert got.count() == 123  # 3 × (40 + 1 fallback record)

    # tail semantics on the SAME running chain: a new chunk appears →
    # only its records are appended (checkpointed exactly-once)
    with open(os.path.join(chunk_dir, "chunk-late.msgpack"), "wb") as f:
        f.write(encode_record(BASE_MS + 99_000_000, {"log": "level=info late 1"}))
    q2 = stream_encode_to_sinks(stream_tr, ck, out, spark).start()
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 124


def test_stream_dual_timer_sync_on_decoded_stream(spark, tmp_path, chunk_dir):
    """The flush/upload leg: decoded stream → enrich/route → dual-timer
    flush decisions → overwrite-per-key sync.  Every closed batch in the
    sync output must match the batch dual-timer operator's decision on
    the identical event sequence."""
    from fluent_bit_clp_spark.streaming.dual_timer import (
        dual_timer_batches,
        stream_dual_timer_sync,
    )

    def to_events(tr):
        return with_sink(enrich(tr, spark)).select(
            "sink",
            "level_id",
            F.octet_length("text").cast("long").alias("n_bytes"),
            "ts",
        )

    ev_stream = to_events(
        msgpack_to_transcripts(stream_msgpack_files(spark, chunk_dir))
    )
    sync_out = str(tmp_path / "synced")
    q = stream_dual_timer_sync(
        ev_stream, sync_out, str(tmp_path / "ck2")
    ).start()
    q.awaitTermination(120)

    sync_dirs = sorted(glob.glob(os.path.join(sync_out, "sync=*")))
    assert sync_dirs, "at least one sync epoch written"
    got = {
        (r.sink, r.batch_id): (r.n_events, r.flush_at_ms)
        for r in spark.read.parquet(*sync_dirs).collect()
    }
    assert got, "dual-timer closed at least one batch"

    ev_batch = to_events(
        msgpack_to_transcripts(read_msgpack_files(spark, chunk_dir))
    ).withColumn("ts_ms", F.unix_millis("ts"))
    want = {
        (r.sink, r.batch_id): (r.n_events, r.flush_at_ms)
        for r in dual_timer_batches(ev_batch).collect()
    }
    for key, val in got.items():
        assert want[key] == val, key


def test_stream_live_tail_search(spark, tmp_path, chunk_dir):
    """Live-tail grep (r6): search_encoded with no dictionary is pure
    stateless projection/filter (logtype rlike + variable predicates +
    decode-verify), so it composes directly onto the streaming chain —
    tail → decode → encode → SEARCH → sink; results equal the batch
    search over the same chunks, and a late chunk's matching record
    arrives incrementally (checkpointed exactly-once)."""
    from fluent_bit_clp_spark.operators.search import search_encoded

    q = "level=error user u* fetched /api/v1/items/* in * ms"
    ck = str(tmp_path / "ck_search")
    out = str(tmp_path / "out_search")

    stream_tr = msgpack_to_transcripts(stream_msgpack_files(spark, chunk_dir))
    enc_stream = _encode_chain(stream_tr, spark)
    hits_stream = search_encoded(enc_stream, q).select(
        "conv_id", "turn_idx", "text"
    )
    sq = (
        hits_stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .format("parquet")
        .option("path", out)
        .start()
    )
    sq.awaitTermination(120)

    batch_enc = _encode_chain(
        msgpack_to_transcripts(read_msgpack_files(spark, chunk_dir)), spark
    )
    want = search_encoded(batch_enc, q).select("conv_id", "turn_idx", "text")
    got = spark.read.parquet(out)
    assert _rows(got) == _rows(want)
    assert got.count() > 0

    # a late chunk with one matching and one non-matching record: only
    # the match is appended
    with open(os.path.join(chunk_dir, "chunk-l2.msgpack"), "wb") as f:
        f.write(encode_record(BASE_MS + 99_100_000, {
            "log": "level=error user u9 fetched /api/v1/items/999 in 1.2 ms"
        }))
        f.write(encode_record(BASE_MS + 99_200_000, {
            "log": "level=info user u9 fetched /api/v1/items/999 in 1.2 ms"
        }))
    sq2 = (
        search_encoded(_encode_chain(stream_tr, spark), q)
        .select("conv_id", "turn_idx", "text")
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .format("parquet")
        .option("path", out)
        .start()
    )
    sq2.awaitTermination(120)
    assert spark.read.parquet(out).count() == got.count() + 1

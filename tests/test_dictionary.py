"""Dense-ID dictionary compaction (rank-by-zone) + streaming msgpack tail
+ capped exact-dedup groups."""

import os

from pyspark.sql import functions as F

from fluent_bit_clp_spark.operators.dictionary import (
    compact_logtype_dict,
    dense_ids,
)


def test_dense_ids_bijection_and_stability(spark):
    keys = [f"key-{i:04d}" for i in range(500)]
    df2 = spark.createDataFrame([(k,) for k in keys], "k string").repartition(2)
    df8 = spark.createDataFrame([(k,) for k in keys], "k string").repartition(8)
    a = {r.k: r.dense_id for r in dense_ids(df2, "k", zones=16).collect()}
    b = {r.k: r.dense_id for r in dense_ids(df8, "k", zones=16).collect()}
    assert a == b  # parallelism-invariant
    assert sorted(a.values()) == list(range(1, 501))  # dense bijection 1..N


def test_dense_ids_duplicate_keys_collapse(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("a",), ("c",), ("b",)], "k string"
    )
    out = dense_ids(df, "k")
    assert out.count() == 3
    assert sorted(r.dense_id for r in out.collect()) == [1, 2, 3]


def test_compact_logtype_dict(spark):
    from fluent_bit_clp_spark.datagen import transcripts
    from fluent_bit_clp_spark.plans.pipeline import encode_pipeline

    enc = encode_pipeline(transcripts(spark, 300, with_edge_rows=False), spark)
    d = compact_logtype_dict(enc)
    n = d.count()
    rows = d.collect()
    assert sorted(r.dense_id for r in rows) == list(range(1, n + 1))
    # hash id ↔ dense id is one-to-one
    assert len({r.logtype_id for r in rows}) == n


def test_stream_msgpack_tail_picks_up_new_files(spark, tmp_path):
    """S1+S3: the streaming source processes existing chunks, then ONLY
    the newly appeared chunk on the next trigger (checkpointed tail)."""
    from fluent_bit_clp_spark.sources.msgpack import (
        encode_record,
        stream_msgpack_files,
    )

    d = tmp_path / "chunks"
    d.mkdir()
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    (d / "a.msgpack").write_bytes(
        encode_record(1000, {"log": "one"}) + encode_record(2000, {"log": "two"})
    )

    def run_once():
        q = (
            stream_msgpack_files(spark, str(d))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 2
    (d / "b.msgpack").write_bytes(encode_record(3000, {"log": "three"}))
    run_once()
    back = spark.read.parquet(out)
    assert back.count() == 3  # exactly-once: a.msgpack not reprocessed
    assert back.where(F.col("ts_ms") == 3000).count() == 1


def test_exact_dedup_groups_capped(spark):
    """The per-group id list is capped (keeps the smallest ids) while
    n_dups stays exact — the all-identical-corpus safety bound."""
    from fluent_bit_clp_spark.operators.dedup import exact_dedup_groups

    rows = [(i, "same text") for i in range(500)] + [(999, "unique")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = exact_dedup_groups(df, "doc_id", max_ids=10).collect()
    assert len(out) == 1
    g = out[0]
    assert g.n_dups == 500
    assert g.doc_ids == list(range(10))


def test_extend_dense_ids_preserves_and_appends(spark):
    """Cross-run dictionary evolution: existing ids stay verbatim, unseen
    keys append after max(existing), deterministically."""
    from fluent_bit_clp_spark.operators.dictionary import extend_dense_ids

    run1 = spark.createDataFrame(
        [(f"k{i:03d}",) for i in range(100)], "k string"
    )
    d1 = dense_ids(run1, "k")
    run2 = spark.createDataFrame(
        [(f"k{i:03d}",) for i in range(50, 150)], "k string"  # 50 overlap
    )
    d2 = extend_dense_ids(d1, run2, "k")
    m1 = {r.k: r.dense_id for r in d1.collect()}
    m2 = {r.k: r.dense_id for r in d2.collect()}
    for k, v in m1.items():
        assert m2[k] == v, k  # old assignments untouched
    new = {k: v for k, v in m2.items() if k not in m1}
    assert len(new) == 50
    assert sorted(new.values()) == list(range(101, 151))  # appended after max
    # idempotent: extending again with the same batch changes nothing
    d3 = extend_dense_ids(d2, run2, "k")
    assert {r.k: r.dense_id for r in d3.collect()} == m2


def test_template_profile(spark):
    """Per-template profile: counts/bytes/ts bounds per logtype; example
    is the MIN decoded text (stable across partitioning); encode-failed
    (null-logtype) rows excluded."""
    from fluent_bit_clp_spark.functions.clp_native import clp_encode
    from fluent_bit_clp_spark.operators.dictionary import template_profile

    rows = [
        ("a", 0, 10, "job 2 done"),
        ("a", 1, 30, "job 11 done"),
        ("b", 0, 20, "job 3 done"),
        ("b", 1, 40, "disk sda1 full"),
        ("c", 0, 50, None),  # null text -> null logtype -> excluded
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts_ms long, text string"
    )
    out = template_profile(clp_encode(df), ts_col="ts_ms", example=True)
    got = {
        r.logtype: (r.n_rows, r.total_bytes, r.first_ts, r.last_ts, r.example)
        for r in out.collect()
    }
    assert len(got) == 2
    job = got["job \x11 done"]
    assert job == (3, 10 + 11 + 10, 10, 30, "job 11 done")  # min() text
    disk = got["disk \x11 full"]
    assert disk == (1, 14, 40, 40, "disk sda1 full")

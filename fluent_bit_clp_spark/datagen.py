"""Deterministic synthetic transcript generator (SURVEY.md §7 M0).

Schema from BASELINE.json ``input_hint``:
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)``.

Generated *distributed and arithmetic-only*: ``spark.range`` + native
column expressions, zero driver-side loops and zero RNG — every value is a
pure function of (row id, seed) via ``xxhash64``, so the table is
bit-identical at any parallelism and any scale (the 10^12-turn story:
generation is an embarrassingly parallel map over a range).

Conversation sizes are two-tier Zipf-ish skewed (FIXTURES.md §1): a few
hot conversations own ~10% of all turns, exercising the salted
repartition path.  Conversation membership is computed by closed-form
block arithmetic — no window, no shuffle.

Text is rendered from parameterized log-style templates covering every
CLP token class (encoded ints, encoded floats, hex dictionary variables,
paths, level tokens, JSON blobs, pure-logtype sentences), mirroring the
reference's integration-test generator
(`/root/reference/plugins/out_clp_s3_v2/examples/docker-compose/docker-compose.yaml:83-101`)
but with CLP-nontrivial variable density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

N_HOT_CONVS = 4
HOT_SHARE = 0.10
NORMAL_CONV_TURNS = 20
BASE_EPOCH_S = 1_767_225_600  # 2026-01-01T00:00:00Z

_ROLES = "array('user','user','user','user','user','user','user','user'," \
    "'assistant','assistant','assistant','assistant','assistant','assistant'," \
    "'assistant','assistant','system','tool','tool','tool')"
_TOOLS = "array('bash','search','browser','editor','scheduler')"
_LEVELS = (
    "array('trace','TRACE','debug','DEBUG','D','info','INFO','I','warn',"
    "'warning','WARN','WARNING','W','critical','error','CRITICAL','ERROR',"
    "'E','wtf','fatal','FATAL','verbose','noise')"  # last two: unknown → default info
)
_STATICS = (
    "array('connection established successfully',"
    "'cache warmed and ready to serve traffic',"
    "'scheduler tick completed with no pending work',"
    "'configuration reloaded from disk',"
    "'heartbeat acknowledged by peer')"
)
_REASONS = (
    "array('connection reset by peer','upstream timeout exceeded',"
    "'disk quota reached','certificate rotation in progress')"
)


def _h(expr: str, salt: int) -> str:
    """Deterministic non-negative hash stream keyed by salt."""
    return f"abs(xxhash64({expr}, {salt}))"


def transcripts(
    spark: SparkSession,
    n_turns: int = 1000,
    seed: int = 42,
    with_edge_rows: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcript table of ~``n_turns`` rows (plus edge rows)."""
    hot_total = int(n_turns * HOT_SHARE)
    hot_size = max(2, hot_total // N_HOT_CONVS)
    hot_total = hot_size * N_HOT_CONVS

    rng = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    s = seed
    conv = (
        f"case when id < {hot_total} then id div {hot_size} "
        f"else {N_HOT_CONVS} + (id - {hot_total}) div {NORMAL_CONV_TURNS} end"
    )
    turn = (
        f"cast(case when id < {hot_total} then id % {hot_size} "
        f"else (id - {hot_total}) % {NORMAL_CONV_TURNS} end as int)"
    )
    role = f"element_at({_ROLES}, cast({_h('id', s)} % 20 as int) + 1)"
    tool = (
        f"case when {role} = 'tool' then "
        f"element_at({_TOOLS}, cast({_h('id', s + 1)} % 5 as int) + 1) end"
    )
    # Per-conversation constant step => strictly increasing ts within conv.
    ts = (
        f"timestamp_seconds({BASE_EPOCH_S} + ({conv}) * 86400 "
        f"+ ({turn}) * (1 + {_h(conv, s + 2)} % 900))"
    )
    tmpl = f"cast({_h('id', s + 3)} % 16 as int)"
    hex8 = f"lower(substring(hex({_h('id', s + 4)}), 1, 8))"
    hex12 = f"lower(substring(hex({_h('id', s + 5)}), 1, 12))"
    i1 = f"cast({_h('id', s + 6)} % 100000 as int)"
    i2 = f"cast({_h('id', s + 7)} % 1000 as int)"
    f2 = f"format_string('%.2f', ({_h('id', s + 8)} % 10000) / 100.0D)"
    f3 = f"format_string('%.3f', ({_h('id', s + 9)} % 1000000) / 1000.0D)"
    level = f"element_at({_LEVELS}, cast({_h('id', s + 10)} % 23 as int) + 1)"
    static = f"element_at({_STATICS}, cast({_h('id', s + 11)} % 5 as int) + 1)"
    reason = f"element_at({_REASONS}, cast({_h('id', s + 12)} % 4 as int) + 1)"
    text = f"""case {tmpl}
      when 0 then format_string('Task %d started by user %s at attempt %d', {i1}, {hex8}, {i2})
      when 1 then format_string('Uploaded chunk %d of %d (%s%%) to /var/log/app-%d.log', {i2}, {i1}, {f2}, {i2} % 16)
      when 2 then format_string('level=%s latency_ms=%s status=%d', {level}, {f3}, 200 + {i2} % 400)
      when 3 then format_string('Retrying container-%s after %ds: %s', {hex12}, {i2} % 120, {reason})
      when 4 then to_json(named_struct('timestamp', date_format({ts}, "yyyy-MM-dd'T'HH:mm:ss'Z'"), 'level', {level}, 'message', format_string('Log message %d from container', {i1}), 'service', 'app'))
      when 5 then format_string('GET /api/v2/users/%d?page=%d took %s ms', {i1}, {i2} % 50, {f3})
      when 6 then format_string('conn %s closed after %d bytes in %s s', {hex8}, {i1} * 37, {f2})
      when 7 then format_string('file_path=/srv/data/%s/%05d.parquet rows=%d', {hex8}, {i2}, {i1})
      else {static}
    end"""
    df = rng.select(
        F.expr(f"format_string('conv-%08d', {conv})").alias("conv_id"),
        F.expr(turn).alias("turn_idx"),
        F.expr(role).alias("role"),
        F.expr(text).alias("text"),
        F.expr(tool).alias("tool"),
        F.expr(ts).alias("ts"),
        F.expr(f"{_h('id', s + 13)} % 1000000").alias("_shuffle_key"),
    )
    if with_edge_rows:
        df = df.unionByName(_edge_rows(spark))
    # FIXTURES.md: rows arrive shuffled — ordering must be restored downstream.
    return (
        df.repartition(F.col("_shuffle_key"))
        .drop("_shuffle_key")
    )


def _edge_rows(spark: SparkSession) -> DataFrame:
    """FIXTURES.md §1 edge rows, in their own well-known conversation."""
    edge = [
        ("conv-edge", 0, "user", "", None, "2026-01-01 00:00:00"),
        ("conv-edge", 1, "assistant", "42 -7 3.14 deadbeef", None, "2026-01-01 00:00:01"),
        ("conv-edge", 2, "system", "esc\x10ape pl\x11aceholder bytes 9", None, "2026-01-01 00:00:02"),
        ("conv-edge", 3, "tool", None, "bash", "2026-01-01 00:00:03"),
        ("conv-edge", 4, "user", "level=verbose unknown severity 1", None, "2026-01-01 00:00:04"),
        ("conv-edge", 5, "assistant", "no timestamp on this row 5", None, None),
    ]
    df = spark.createDataFrame(
        [(c, t, r, x, tl, ts) for c, t, r, x, tl, ts in edge],
        "conv_id string, turn_idx int, role string, text string, tool string, ts_s string",
    ).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.to_timestamp("ts_s").alias("ts"),
        F.lit(999_999_999).alias("_shuffle_key"),
    )
    # Huge turn (>2 MiB) forcing a chunk boundary (FIXTURES.md §1).
    huge = spark.range(1).select(
        F.lit("conv-edge").alias("conv_id"),
        F.lit(6).cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.expr("repeat('payload block 77 value 3.5 id cafe01 | ', 80000)").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.expr("timestamp'2026-01-01 00:00:06'").alias("ts"),
        F.lit(999_999_998).alias("_shuffle_key"),
    )
    return df.unionByName(huge)


def write_transcripts(
    spark: SparkSession,
    path: str,
    n_turns: int,
    seed: int = 42,
    fmt: str = "parquet",
) -> None:
    """Materialize the transcript table (parquet stands in for Iceberg when
    no Iceberg runtime jar is on the classpath — same layout, same tests)."""
    transcripts(spark, n_turns, seed).write.mode("overwrite").format(fmt).save(path)

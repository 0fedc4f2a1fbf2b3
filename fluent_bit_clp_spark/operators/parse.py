"""Record-parse operators over reference-shaped JSON log records
(SURVEY.md §2.2 P3/P4/P5).

The reference consumes Msgpack ``[timestamp, {k: v, ...}]`` tuples and
restructures them into the two CLP KV namespaces
(`/root/reference/plugins/out_clp_s3_v2/out_clp_s3_v2.go:307-333`
``buildLogEvent``).  Our analogue parses JSON record columns (FIXTURES.md
§4 reference-shaped JSONL) with native `from_json` — PERMISSIVE, parse
failures become null rows counted as ``encode_failures`` rather than
aborting (`out_clp_s3_v2.go:297-305` drops + logs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# filePathKey constant, out_clp_s3_v2.go:102-105
FILE_PATH_KEY = "file_path"

RECORD_SCHEMA = T.MapType(T.StringType(), T.StringType())


def parse_json_records(df: DataFrame, json_col: str = "record_json") -> DataFrame:
    """P3: JSON bytes → map<string,string> (dynamic KV record).

    ``from_json`` returns null on malformed input (PERMISSIVE); the
    ``parse_failed`` flag feeds the failure counters.
    """
    return df.withColumn(
        "record", F.from_json(F.col(json_col), RECORD_SCHEMA)
    ).withColumn(
        "parse_failed", F.col(json_col).isNotNull() & F.col("record").isNull()
    )


def single_key_message(
    use_single_key: bool = True,
    single_key: str = "log",
    allow_missing_key: bool = True,
    record_col: str = "record",
    json_col: str = "record_json",
) -> Column:
    """P4: ``getMessage`` semantics (flush.go:149-176): extract one string
    field; fall back to the whole JSON record when the key is missing and
    ``allow_missing_key``; otherwise null (counted as a failure)."""
    if not use_single_key:
        return F.col(json_col)
    extracted = F.element_at(F.col(record_col), single_key)
    if allow_missing_key:
        return F.coalesce(extracted, F.col(json_col))
    return extracted


def split_kv_namespaces(
    df: DataFrame, ts_col: str = "ts", record_col: str = "record"
) -> DataFrame:
    """P5: ``buildLogEvent`` — move ``file_path`` user→auto, stamp the
    timestamp (Unix millis) into the auto namespace, everything else stays
    user KV.  Pure native map functions, map-only stage."""
    auto = F.struct(
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("timestamp"),
        F.coalesce(
            F.element_at(F.col(record_col), FILE_PATH_KEY), F.lit("")
        ).alias(FILE_PATH_KEY),
    )
    user = F.map_filter(F.col(record_col), lambda k, _: k != FILE_PATH_KEY)
    return df.withColumn("auto_kv", auto).withColumn("user_kv", user)


def log_event(df: DataFrame) -> DataFrame:
    """The full ffi.LogEvent analogue column:
    ``struct<auto: struct<timestamp, file_path>, user: map<string,string>>``."""
    return df.withColumn(
        "log_event",
        F.struct(F.col("auto_kv").alias("auto"), F.col("user_kv").alias("user")),
    )

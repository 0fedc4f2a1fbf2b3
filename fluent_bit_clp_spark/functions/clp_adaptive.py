"""Length-adaptive CLP encode: native expressions for the common case,
Arrow pandas UDF for pathological turns — in ONE pass.

Catalyst higher-order functions evaluate interpreted (outside codegen), so
a single multi-MiB turn with ~10^5 variable tokens costs tens of seconds
as one straggler task — while CPython's `re` scanner handles the same text
in milliseconds.  The two implementations are field-for-field identical
(property-tested in tests/test_clp_core.py), so we route *by masking*, not
by splitting: the native path encodes ``when(short, text)`` and the pandas
UDF encodes ``when(long, text)`` — each sees nulls for the other's rows
(null-propagation makes the skipped side ~free, and Arrow only ships the
masked text column to Python, which is nearly all nulls).  Per-field
``coalesce`` merges the results.  No union ⇒ the upstream chunk-offset
shuffle is computed exactly once.

This is textual skew handling, the same stance as salting for key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_clp_spark.functions.clp_native import clp_encode
from fluent_bit_clp_spark.functions.clp_pandas import clp_encode_udf

DEFAULT_LONG_TEXT_BYTES = 16384

_FIELDS = ["logtype", "var_kinds", "encoded_vars", "dict_vars"]


def clp_encode_adaptive(
    df: DataFrame,
    text_col: str = "text",
    long_text_bytes: int = DEFAULT_LONG_TEXT_BYTES,
) -> DataFrame:
    is_long = F.coalesce(
        F.octet_length(F.col(text_col)) > long_text_bytes, F.lit(False)
    )
    out = df.withColumn(
        "_t_short", F.when(~is_long, F.col(text_col))
    ).withColumn("_t_long", F.when(is_long, F.col(text_col)))
    out = clp_encode(out, "_t_short")
    out = out.withColumn("_enc_long", clp_encode_udf()(F.col("_t_long")))
    for fld in _FIELDS:
        out = out.withColumn(fld, F.coalesce(F.col(fld), F.col(f"_enc_long.{fld}")))
    # ids recomputed over the merged columns (hash-stable either way)
    out = out.withColumn(
        "dict_var_ids",
        F.expr(
            "transform(dict_vars, v -> case when v is not null then xxhash64(v) end)"
        ),
    ).withColumn("logtype_id", F.expr("xxhash64(logtype)"))
    return out.drop("_t_short", "_t_long", "_enc_long")

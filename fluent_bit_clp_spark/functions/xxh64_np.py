"""Numpy-vectorized XXH64 — batch-hash many short strings in one shot.

Bit-exact with the pure-Python ``xxh64`` in ``clp_pandas`` (itself pinned
against Spark's ``xxhash64(string)`` JVM implementation), so ids produced
here are interchangeable with both.  Motivation: after round 5's
memoization the encoder's remaining #1 cost was the ~35 % of id hashes
that MISS the cache (unique dict variables — conversation ids, uuids —
hashed one Python-bytecode round at a time).  Batching the misses turns
that into a handful of numpy passes over a padded byte matrix: every
XXH64 step (stripe rounds, merge, tail chunks, avalanche) is data-
parallel across rows, and per-string work is only the initial byte copy.

Layout: all inputs are packed into one contiguous buffer, padded into an
(N × ceil32(maxlen)) uint8 matrix, and viewed as little-endian uint64 /
uint32 words — exactly the loads the scalar algorithm performs.  The
stripe loop runs ``max(len)//32`` iterations of vectorized lane rounds
with a per-row active mask; the ≤31-byte tail is gathered into a fixed
(N × 32) window so the 8/4/1-byte finishers are masked ``where`` selects.
Pathologically mixed batches (one multi-MiB string among thousands of
short ones) would pad the whole matrix to the longest row, so rows above
``_LONG_CUTOFF`` take the scalar path instead — the cutoff keeps the
padded matrix ≤ ~64 MiB for a full 16k-unique batch.

numpy 1.26 note: uint64 mixed with a Python int upcasts to float64
(pre-NEP50 value-based casting), silently corrupting hashes — every
constant, including shift counts, is therefore a typed ``np.uint64``.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_U64 = np.uint64(64)

# length-bucket boundaries: each bucket pads to its own max, bounding
# padding waste while keeping long strings (logtypes run to many KiB)
# on the vectorized path; beyond the last boundary a single huge string
# is a batch of one, which the core handles fine
_BUCKETS = (32, 256, 2048, 16384, 131072)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    rr = np.uint64(r)
    return (x << rr) | (x >> (_U64 - rr))


def _lane_round(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    return _rotl(acc + lane * _P2, 31) * _P1


def xxh64_batch(items: list[bytes], seed: int = 42) -> np.ndarray:
    """XXH64 of each byte string, as a signed-int64 array (Spark's
    ``xxhash64`` sign convention).  Empty input → empty array.  Items are
    grouped into length buckets so one long string doesn't pad the whole
    matrix to its width."""
    n_items = len(items)
    out = np.empty(n_items, dtype=np.int64)
    if n_items == 0:
        return out
    buckets: dict[int, list[int]] = {}
    for i, b in enumerate(items):
        n = len(b)
        for cap in _BUCKETS:
            if n <= cap:
                buckets.setdefault(cap, []).append(i)
                break
        else:
            buckets.setdefault(-1, []).append(i)  # huge: one-at-a-time
    if len(buckets) == 1 and -1 not in buckets:
        return _hash_uniform(items, seed)
    for cap, idx in buckets.items():
        if cap == -1:
            for i in idx:
                out[i] = _hash_uniform([items[i]], seed)[0]
        else:
            out[np.array(idx)] = _hash_uniform([items[i] for i in idx], seed)
    return out


def _hash_uniform(items: list[bytes], seed: int) -> np.ndarray:
    """The vectorized core — one padded matrix for the whole batch."""
    n_items = len(items)
    lens = np.array([len(b) for b in items], dtype=np.int64)
    maxlen = int(lens.max(initial=0))
    # pad to a multiple of 32 so the uint64/uint32 word views cover every
    # stripe and tail position without bounds checks
    width = max(32, (maxlen + 31) // 32 * 32)
    # C-speed pad-and-pack: one ljust per item beats 20k numpy slice
    # assignments by an order of magnitude
    buf = np.frombuffer(
        b"".join(b.ljust(width, b"\x00") for b in items), dtype=np.uint8
    ).reshape(n_items, width)
    w64 = buf.view("<u8")  # (N, width//8) little-endian lanes
    w32 = buf.view("<u4")  # (N, width//4)

    m64 = (1 << 64) - 1
    useed = np.uint64(seed & m64)
    is_long = lens >= 32
    # stripes per row: floor((n-32)/32)+1 for n>=32 (the scalar loop's
    # trip count), 0 otherwise
    stripes = np.where(is_long, (lens - 32) // 32 + 1, 0)
    # lane seeds folded in Python-int space (np scalar +/- would warn on
    # the intended wraparound)
    v1 = np.full(n_items, (seed + int(_P1) + int(_P2)) & m64, dtype=np.uint64)
    v2 = np.full(n_items, (seed + int(_P2)) & m64, dtype=np.uint64)
    v3 = np.full(n_items, useed, dtype=np.uint64)
    v4 = np.full(n_items, (seed - int(_P1)) & m64, dtype=np.uint64)
    for s in range(int(stripes.max(initial=0))):
        m = stripes > s
        c = 4 * s
        v1 = np.where(m, _lane_round(v1, w64[:, c]), v1)
        v2 = np.where(m, _lane_round(v2, w64[:, c + 1]), v2)
        v3 = np.where(m, _lane_round(v3, w64[:, c + 2]), v3)
        v4 = np.where(m, _lane_round(v4, w64[:, c + 3]), v4)
    h_long = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
    for v in (v1, v2, v3, v4):  # merge rounds
        h_long = (h_long ^ _lane_round(np.zeros_like(v), v)) * _P1 + _P4
    h_short = np.uint64((seed + int(_P5)) & m64)
    h = np.where(is_long, h_long, h_short) + lens.astype(np.uint64)

    # tail: the last len%32 (long) / len (short) bytes, gathered into a
    # fixed 32-byte window so chunk k of every row sits at word k
    tail_start = np.where(is_long, stripes * 32, 0)
    tail_len = lens - tail_start  # 0..31
    cols = tail_start[:, None] + np.arange(32)
    rows = np.arange(n_items)[:, None]
    tail = np.where(
        np.arange(32) < tail_len[:, None],
        buf[rows, np.minimum(cols, width - 1)],
        0,
    ).astype(np.uint8)
    t64 = np.ascontiguousarray(tail).view("<u8")  # (N, 4)
    t32 = np.ascontiguousarray(tail).view("<u4")  # (N, 8)
    for k in range(3):  # up to three 8-byte finishers
        m = tail_len >= (k + 1) * 8
        hk = (h ^ _lane_round(np.zeros(n_items, np.uint64), t64[:, k]))
        h = np.where(m, _rotl(hk, 27) * _P1 + _P4, h)
    n8 = np.minimum(tail_len // 8, 3)
    m4 = (tail_len - n8 * 8) >= 4
    k4 = np.take_along_axis(t32, (n8 * 2)[:, None], axis=1)[:, 0].astype(
        np.uint64
    )
    h = np.where(m4, _rotl(h ^ (k4 * _P1), 23) * _P2 + _P3, h)
    byte_start = n8 * 8 + np.where(m4, 4, 0)
    for j in range(3):  # up to three 1-byte finishers
        pos = byte_start + j
        m = pos < tail_len
        b = tail[np.arange(n_items), np.minimum(pos, 31)].astype(np.uint64)
        h = np.where(m, _rotl(h ^ (b * _P5), 11) * _P1, h)

    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h.view(np.int64)


def xxh64_batch_strs(strs: list[str], seed: int = 42) -> np.ndarray:
    """UTF-8 convenience wrapper (the id convention everywhere here)."""
    return xxh64_batch([s.encode("utf-8") for s in strs], seed)

"""Delta + varbyte posting-list codec, NumPy-vectorized.

The inverted index stores, per term, a sorted run of (doc_id, tf) pairs
compressed as: doc_id deltas (first value absolute) and raw tfs, each
varbyte-encoded (7 data bits per byte, high bit = continuation). This is the
classic IR posting compression (Manning/Raghavan/Schütze ch. 5 — public
algorithm); the reference has no index at all (it refits TF-IDF per query,
data_manager.py:122-123), so this is the engine's scale substitute.

Both encode and decode are vectorized over the whole array (no per-element
Python), so they run fast inside Arrow batches per input_hint's
"no per-row Python" rule.

Block-max metadata for WAND: postings are chunked into BLOCK docs; per block
we keep the max tf and max doc_id so the scorer can skip whole blocks that
cannot reach the current top-k threshold (SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128  # docs per block for block-max metadata


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array to varbyte. Vectorized: compute per-value byte
    lengths, scatter 7-bit groups into a flat output buffer."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1 — computed by comparing
    # against the 9 fixed 2^(7L) thresholds (vectorized, float-safe)
    lens = np.ones(v.shape, dtype=np.int64)
    for L in range(1, 10):
        lens += (v >= (np.uint64(1) << np.uint64(7 * L))).astype(np.int64)
    total = int(lens.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(lens)  # position AFTER each value's last byte
    # For byte j (0-based from the end) of each value: out[end-1-j] holds bits
    # j*7..j*7+6; continuation bit set on all but the last byte (j == 0).
    maxlen = int(lens.max())
    for j in range(maxlen):
        mask = lens > j
        idx = ends[mask] - 1 - j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        b = chunk.astype(np.uint8)
        if j > 0:
            b |= np.uint8(0x80)
        out[idx] = b
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Decode varbyte → uint64 array. Vectorized via cumulative group ids."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0  # terminal byte of each value
    # group id for each byte: index of the value it belongs to
    # a value's bytes are [continuation..., terminal]; group = count of
    # terminals strictly before this byte
    gid = np.zeros(raw.size, dtype=np.int64)
    np.cumsum(is_last[:-1], out=gid[1:])
    nvals = int(is_last.sum())
    # byte position within its value, counted from the terminal byte (0 = last)
    ends = np.flatnonzero(is_last)
    pos_from_end = ends[gid] - np.arange(raw.size)
    vals = np.zeros(nvals, dtype=np.uint64)
    np.add.at(
        vals,
        gid,
        (raw & np.uint8(0x7F)).astype(np.uint64) << (7 * pos_from_end.astype(np.uint64)),
    )
    return vals


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode a sorted (doc_id, tf) run: [n][varbyte deltas][varbyte tfs].

    doc_ids must be sorted ascending and unique; tfs >= 1. doc_ids are signed
    64-bit hashes — we bias by 2^63 so deltas stay unsigned.
    """
    d = np.asarray(doc_ids, dtype=np.int64)
    t = np.asarray(tfs, dtype=np.int64)
    if d.size == 0:
        return np.int64(0).tobytes()
    u = d.astype(np.uint64) + np.uint64(1 << 63)  # order-preserving bias
    deltas = np.empty_like(u)
    deltas[0] = u[0]
    np.subtract(u[1:], u[:-1], out=deltas[1:])
    header = np.int64(d.size).tobytes()
    db = varbyte_encode(deltas)
    return header + np.int64(len(db)).tobytes() + db + varbyte_encode(t.astype(np.uint64))


def decode_postings(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode → (doc_ids int64 sorted, tfs int64)."""
    n = int(np.frombuffer(buf[:8], dtype=np.int64)[0])
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    dlen = int(np.frombuffer(buf[8:16], dtype=np.int64)[0])
    deltas = varbyte_decode(buf[16 : 16 + dlen])
    tfs = varbyte_decode(buf[16 + dlen :])
    u = np.cumsum(deltas, dtype=np.uint64)
    doc_ids = (u - np.uint64(1 << 63)).astype(np.int64)
    return doc_ids, tfs.astype(np.int64)


def block_max_meta(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-block (max doc_id, max tf) for block-max WAND skipping."""
    n = len(doc_ids)
    nblocks = (n + BLOCK - 1) // BLOCK
    pad = nblocks * BLOCK - n
    d = np.pad(np.asarray(doc_ids, dtype=np.int64), (0, pad), constant_values=np.iinfo(np.int64).min)
    t = np.pad(np.asarray(tfs, dtype=np.int64), (0, pad), constant_values=0)
    return (
        d.reshape(nblocks, BLOCK).max(axis=1),
        t.reshape(nblocks, BLOCK).max(axis=1),
    )


def merge_sorted_runs(runs: list[tuple[np.ndarray, np.ndarray]]) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted (doc_id, tf) runs for one term, summing tf on duplicate
    doc_ids (duplicates appear when a salted hot term is re-merged, or on
    resumed incremental builds). Vectorized concat+sort merge — the runs are
    per-partition outputs so a k-way heap merge is unnecessary at this level.
    """
    if not runs:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    d = np.concatenate([r[0] for r in runs])
    t = np.concatenate([r[1] for r in runs])
    order = np.argsort(d, kind="stable")
    d, t = d[order], t[order]
    if d.size == 0:
        return d, t
    boundary = np.empty(d.size, dtype=bool)
    boundary[0] = True
    np.not_equal(d[1:], d[:-1], out=boundary[1:])
    groups = np.cumsum(boundary) - 1
    out_d = d[boundary]
    out_t = np.zeros(out_d.size, dtype=np.int64)
    np.add.at(out_t, groups, t)
    return out_d, out_t

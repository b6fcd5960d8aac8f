"""Posting-block codec: docID-delta + varint, fully NumPy-vectorized.

Plays the role the reference's sequenced wire segments play for its
corpus stream (reference: search-engine/internal/segment_serializer/
segment_serializer.go:122-172 — fixed-size sequenced frames of a
serialized row stream), re-imagined as compressed, sorted,
max-score-annotated posting blocks (SURVEY.md §1.3, §7 M3).

A posting list for one term is a sorted int64 doc_id array plus
parallel uint32 tf and doc_len arrays. It is cut into BLOCK_SIZE-doc
blocks; each block stores:

- ``first_doc`` / ``last_doc`` (int64 metadata columns, for skipping)
- ``n`` docs in block
- ``max_score`` — exact max BM25 contribution of any doc in the block
  (computed at encode time with the build's idf/avgdl), the block-max
  WAND bound while the index stats are unchanged
- ``max_tf`` / ``min_dl`` — the stats-independent bound ingredients:
  idf·tfcomp(max_tf, min_dl, avgdl) ≥ any doc's contribution for ANY
  (idf, avgdl), because tfcomp is monotone ↑ in tf and ↓ in dl. After
  a delta compaction changes n_docs/avgdl/idf, stored max_score is
  stale but this dynamic bound stays valid — pruning degrades a
  little, correctness never.
- ``doc_bytes`` — varint(diff(doc_ids)) (n-1 values; first doc is in
  metadata)
- ``tf_bytes`` — varint stream of tfs

doc_len is NOT stored per posting (a doc's length would repeat once
per term it contains — measured 3.2x corpus size round 1). It lives
once per doc in a per-salt-range sidecar (encode_dl_chunks below):
doc_ids are dense within a salt range, so a chunk is just
(first_doc, n, varint dls) and lookup is arr[doc - base].

Varint = LEB128 (7 data bits per byte, high bit = continuation),
encoded/decoded with O(max_len) vectorized passes, no per-element
Python loop.
"""

from __future__ import annotations

import numpy as np

from zensearch_spark import B, BLOCK_SIZE, K1


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative integer array (vectorized)."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(n, dtype=np.int64)
    tmp = vals.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits // 7, 1)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    shifted = vals.copy()
    for k in range(int(nbytes.max())):
        mask = nbytes > k
        byte = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        more = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[offsets[mask] + k] = byte | more
        shifted >>= np.uint64(7)
    return out.tobytes()


def decode_varints(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_varints` → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.flatnonzero(b < 128)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    for k in range(int(lengths.max())):
        idx = lengths > k
        vals[idx] |= (b[starts[idx] + k] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(
            7 * k
        )
    return vals


def bm25_tf_component(
    tf: np.ndarray, doc_len: np.ndarray, avgdl: float, k1: float = K1, b: float = B
) -> np.ndarray:
    """Canonical BM25 TF component: tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).

    Semantics pinned by BASELINE.json (canonical parenthesization; the
    reference's degenerate variant at search-engine/internal/bm25/
    tf.go:23-26 is intentionally NOT reproduced — SURVEY.md §2
    semantics note).
    """
    tf = tf.astype(np.float64)
    dl = doc_len.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    idf: float,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> list[dict]:
    """Cut one sorted posting list into compressed blocks.

    Returns a list of dicts, one per block, with keys
    (block_seq, n, first_doc, last_doc, max_score, max_tf, min_dl,
    doc_bytes, tf_bytes). doc_ids MUST be sorted ascending and unique.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    n_total = len(doc_ids)
    blocks: list[dict] = []
    for seq, lo in enumerate(range(0, n_total, block_size)):
        hi = min(lo + block_size, n_total)
        docs = doc_ids[lo:hi]
        tf = np.ascontiguousarray(tfs[lo:hi], dtype=np.uint64)
        dl = np.ascontiguousarray(doc_lens[lo:hi], dtype=np.uint64)
        contrib = idf * bm25_tf_component(tf, dl, avgdl)
        blocks.append(
            {
                "block_seq": seq,
                "n": int(hi - lo),
                "first_doc": int(docs[0]),
                "last_doc": int(docs[-1]),
                "max_score": float(contrib.max()),
                "max_tf": int(tf.max()),
                "min_dl": int(dl.min()),
                "doc_bytes": encode_varints(np.diff(docs).astype(np.uint64)),
                "tf_bytes": encode_varints(tf),
            }
        )
    return blocks


def _varint_nbytes(vals: np.ndarray) -> np.ndarray:
    """Per-value LEB128 encoded length (vectorized)."""
    vals = vals.astype(np.uint64)
    nb = np.ones(len(vals), dtype=np.int64)
    for k in range(1, 10):
        nb += (vals >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    return nb


def encode_sorted_runs(
    salt: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    idfs: np.ndarray,
    group_change: np.ndarray,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> dict[str, np.ndarray | list]:
    """Whole-partition vectorized block encoding.

    Input: parallel row arrays covering MANY (term, salt) posting
    groups, sorted by (group, doc_id); ``group_change[i]`` is True
    where row i starts a new group. One NumPy pass computes every
    block's metadata and byte streams — no per-group Python call
    (the per-group applyInPandas variant costs one interpreter round
    trip per group, which at web scale means one per term·salt).

    Returns column arrays for the blocks table (minus term/salt
    columns, which the caller takes at ``block_start`` rows via the
    returned ``row_of_block`` index).
    """
    n = len(doc_ids)
    if n == 0:
        return {
            "row_of_block": np.empty(0, np.int64),
            "block_seq": np.empty(0, np.int32),
            "n": np.empty(0, np.int32),
            "first_doc": np.empty(0, np.int64),
            "last_doc": np.empty(0, np.int64),
            "max_score": np.empty(0, np.float64),
            "max_tf": np.empty(0, np.int64),
            "min_dl": np.empty(0, np.int64),
            "doc_bytes": [],
            "tf_bytes": [],
        }
    doc_ids = np.ascontiguousarray(doc_ids, np.int64)
    grp_id = np.cumsum(group_change) - 1
    grp_first_row = np.flatnonzero(group_change)
    pos_in_group = np.arange(n) - grp_first_row[grp_id]
    block_in_group = pos_in_group // block_size
    block_start = group_change | (pos_in_group % block_size == 0)
    block_starts = np.flatnonzero(block_start)
    n_blocks = len(block_starts)
    block_ends = np.concatenate([block_starts[1:], [n]])
    counts = (block_ends - block_starts).astype(np.int32)

    contrib = idfs * bm25_tf_component(tfs, doc_lens, avgdl)
    max_score = np.maximum.reduceat(contrib, block_starts)
    max_tf = np.maximum.reduceat(
        np.ascontiguousarray(tfs, np.int64), block_starts
    )
    min_dl = np.minimum.reduceat(
        np.ascontiguousarray(doc_lens, np.int64), block_starts
    )

    # doc-delta stream: per-row delta, excluded at block starts
    delta = np.empty(n, np.int64)
    delta[0] = 0
    delta[1:] = doc_ids[1:] - doc_ids[:-1]
    keep = ~block_start
    doc_stream_vals = delta[keep].astype(np.uint64)
    doc_nb = np.zeros(n, np.int64)
    doc_nb[keep] = _varint_nbytes(doc_stream_vals)
    doc_block_len = np.add.reduceat(doc_nb, block_starts)
    doc_buf = encode_varints(doc_stream_vals)

    tf_vals = np.ascontiguousarray(tfs, np.uint64)
    tf_nb = _varint_nbytes(tf_vals)
    tf_block_len = np.add.reduceat(tf_nb, block_starts)
    tf_buf = encode_varints(tf_vals)

    def slices(buf: bytes, lens: np.ndarray) -> list[bytes]:
        offs = np.concatenate([[0], np.cumsum(lens)])
        return [buf[offs[i]: offs[i + 1]] for i in range(n_blocks)]

    return {
        "row_of_block": block_starts,
        "block_seq": block_in_group[block_starts].astype(np.int32),
        "n": counts,
        "first_doc": doc_ids[block_starts],
        "last_doc": doc_ids[block_ends - 1],
        "max_score": max_score,
        "max_tf": max_tf,
        "min_dl": min_dl,
        "doc_bytes": slices(doc_buf, doc_block_len),
        "tf_bytes": slices(tf_buf, tf_block_len),
    }


def decode_block(
    first_doc: int, doc_bytes: bytes, tf_bytes: bytes
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block → (doc_ids int64, tfs int64)."""
    deltas = decode_varints(doc_bytes).astype(np.int64)
    docs = np.empty(len(deltas) + 1, dtype=np.int64)
    docs[0] = first_doc
    if len(deltas):
        np.cumsum(deltas, out=docs[1:])
        docs[1:] += first_doc
    tfs = decode_varints(tf_bytes).astype(np.int64)
    return docs, tfs


def encode_dl_chunks(
    doc_ids: np.ndarray, doc_lens: np.ndarray, chunk: int = 8192
) -> list[dict]:
    """doc_len sidecar rows for ONE dense doc_id range (a salt range):
    [(first_doc, n, dl_bytes)]. doc_ids MUST be consecutive ascending
    (dense ranks within a salt range) — lookup is then positional,
    dls[doc - first_doc], no doc stream stored at all."""
    doc_ids = np.ascontiguousarray(doc_ids, np.int64)
    n = len(doc_ids)
    if n == 0:
        return []
    if n > 1 and not (np.diff(doc_ids) == 1).all():
        raise ValueError("doc_len sidecar requires dense doc_id ranges")
    out = []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        out.append(
            {
                "first_doc": int(doc_ids[lo]),
                "n": int(hi - lo),
                "dl_bytes": encode_varints(
                    np.ascontiguousarray(doc_lens[lo:hi], np.uint64)
                ),
            }
        )
    return out


def decode_dl_chunk(dl_bytes: bytes) -> np.ndarray:
    """Inverse of one encode_dl_chunks row → int64 doc_len array."""
    return decode_varints(dl_bytes).astype(np.int64)

"""Codec fixtures per FIXTURES.md §4: round-trip + block-max exactness."""

from __future__ import annotations

import numpy as np
import pytest

from zensearch_spark.functions.codec import (
    bm25_tf_component,
    decode_block,
    decode_varints,
    encode_blocks,
    encode_varints,
)


@pytest.mark.parametrize("n", [0, 1, 127, 128, 129, 10_000])
def test_varint_roundtrip_lengths(n):
    rng = np.random.default_rng(7 + n)
    vals = rng.integers(0, 2**40, size=n).astype(np.uint64)
    assert np.array_equal(decode_varints(encode_varints(vals)), vals)


def test_varint_edge_values():
    vals = np.array([0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**63 - 1, 2**64 - 1],
                    dtype=np.uint64)
    assert np.array_equal(decode_varints(encode_varints(vals)), vals)


@pytest.mark.parametrize("gaps", ["unit", "uniform", "heavy"])
@pytest.mark.parametrize("n", [1, 127, 128, 129, 10_000])
def test_block_roundtrip(gaps, n):
    rng = np.random.default_rng(hash((gaps, n)) % 2**31)
    if gaps == "unit":
        docs = np.arange(n, dtype=np.int64) + 5
    elif gaps == "uniform":
        docs = np.cumsum(rng.integers(1, 1000, size=n)).astype(np.int64)
    else:
        steps = (rng.pareto(0.7, size=n) * 10 + 1).astype(np.int64)
        docs = np.cumsum(steps)
    tfs = rng.integers(1, 500, size=n).astype(np.int64)
    dls = rng.integers(1, 2000, size=n).astype(np.int64)
    avgdl, idf = 40.0, 3.21
    blocks = encode_blocks(docs, tfs, dls, idf=idf, avgdl=avgdl)
    got_docs, got_tfs = [], []
    pos = 0
    for blk in blocks:
        d, t = decode_block(blk["first_doc"], blk["doc_bytes"], blk["tf_bytes"])
        assert len(d) == blk["n"] == len(t)
        assert d[0] == blk["first_doc"] and d[-1] == blk["last_doc"]
        l = dls[pos: pos + blk["n"]]
        pos += blk["n"]
        # per-block max_score is the exact max BM25 contribution
        exact = idf * bm25_tf_component(t, l, avgdl)
        assert blk["max_score"] == pytest.approx(exact.max(), abs=0, rel=0)
        # stats-independent bound ingredients: valid upper bound for
        # ANY avgdl because tfcomp is monotone ↑ tf, ↓ dl
        assert blk["max_tf"] == t.max() and blk["min_dl"] == l.min()
        for any_avgdl in (10.0, 40.0, 400.0):
            dyn = idf * bm25_tf_component(
                np.array([blk["max_tf"]]), np.array([blk["min_dl"]]), any_avgdl
            )[0]
            true_max = (idf * bm25_tf_component(t, l, any_avgdl)).max()
            assert dyn >= true_max - 1e-12
        got_docs.append(d); got_tfs.append(t)
    assert np.array_equal(np.concatenate(got_docs), docs)
    assert np.array_equal(np.concatenate(got_tfs), tfs)


def test_empty_posting_list():
    assert encode_blocks(np.array([], dtype=np.int64), np.array([]), np.array([]),
                         idf=1.0, avgdl=40.0) == []


def test_hypothesis_roundtrip_optional():
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not available")

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
    def check(vals):
        arr = np.array(vals, dtype=np.uint64)
        assert np.array_equal(decode_varints(encode_varints(arr)), arr)

    check()


def test_encode_sorted_runs_equals_per_list_encoder():
    """Whole-partition vectorized encoder must produce byte-identical
    blocks to the per-list reference encoder across many groups."""
    rng = np.random.default_rng(123)
    terms, salts, docs, tfs, dls, idfs = [], [], [], [], [], []
    group_change = []
    avgdl = 37.5
    per_group = {}
    for g, (term, salt) in enumerate(
        [("a", 0), ("a", 1), ("bb", 0), ("ccc", 3), ("ccc", 4), ("d", 0)]
    ):
        n = int(rng.integers(1, 400))
        d = np.cumsum(rng.integers(1, 50, size=n)).astype(np.int64)
        t = rng.integers(1, 30, size=n).astype(np.int64)
        l = rng.integers(1, 500, size=n).astype(np.int64)
        idf = float(rng.uniform(0.1, 5.0))
        per_group[(term, salt)] = (d, t, l, idf)
        terms += [term] * n
        salts += [salt] * n
        docs.append(d); tfs.append(t); dls.append(l)
        idfs += [idf] * n
        group_change += [True] + [False] * (n - 1)

    from zensearch_spark.functions.codec import encode_sorted_runs

    enc = encode_sorted_runs(
        np.array(salts, np.int32),
        np.concatenate(docs),
        np.concatenate(tfs),
        np.concatenate(dls),
        np.array(idfs, np.float64),
        np.array(group_change, bool),
        avgdl=avgdl,
    )
    terms_arr = np.array(terms, dtype=object)
    salts_arr = np.array(salts, np.int32)
    rb = enc["row_of_block"]
    i = 0
    for (term, salt), (d, t, l, idf) in per_group.items():
        want = encode_blocks(d, t, l, idf=idf, avgdl=avgdl)
        for b in want:
            assert terms_arr[rb[i]] == term and salts_arr[rb[i]] == salt
            assert enc["block_seq"][i] == b["block_seq"]
            assert enc["n"][i] == b["n"]
            assert enc["first_doc"][i] == b["first_doc"]
            assert enc["last_doc"][i] == b["last_doc"]
            assert enc["max_score"][i] == b["max_score"]
            assert enc["max_tf"][i] == b["max_tf"]
            assert enc["min_dl"][i] == b["min_dl"]
            assert enc["doc_bytes"][i] == b["doc_bytes"]
            assert enc["tf_bytes"][i] == b["tf_bytes"]
            i += 1
    assert i == len(rb)


def test_dl_sidecar_roundtrip():
    from zensearch_spark.functions.codec import decode_dl_chunk, encode_dl_chunks

    rng = np.random.default_rng(5)
    for n in (0, 1, 8191, 8192, 8193, 30_000):
        base = 1_000_000
        docs = np.arange(base, base + n, dtype=np.int64)
        dls = rng.integers(1, 5000, size=n).astype(np.int64)
        rows = encode_dl_chunks(docs, dls)
        got = np.zeros(n, np.int64)
        for r in rows:
            off = r["first_doc"] - base
            got[off: off + r["n"]] = decode_dl_chunk(r["dl_bytes"])
        assert np.array_equal(got, dls)
    # non-dense ranges must be rejected loudly
    with pytest.raises(ValueError):
        encode_dl_chunks(np.array([1, 3], np.int64), np.array([5, 6], np.int64))

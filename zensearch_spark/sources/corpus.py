"""Deterministic synthetic transcripts corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

A "document" = one turn, keyed (conv_id, turn_idx) — the analog of
the reference's webpages(url, title, contents) row
(reference: db.init.sql:9-16).

Determinism contract: every conversation is generated from an RNG
seeded purely by (seed, conv_index), so the corpus is identical no
matter how conv indices are partitioned across executors. The Zipf
vocabulary (s≈1.1, V=50k) gives genuine hot-term skew to exercise
the salted-repartition path (SURVEY.md §7 M0/M3).

Generation is vectorized NumPy inside mapInPandas — no per-row
Python (input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

VOCAB_SIZE = 50_000
ZIPF_S = 1.1
MAX_TURNS = 16
EPOCH_NS = np.int64(1_767_225_600_000_000_000)  # 2026-01-01T00:00:00Z
STEP_NS = np.int64(13_000_000_000)  # 13s per global turn slot

TOOL_NAMES = [f"tool_{i:02d}" for i in range(20)]

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_VOCAB_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

_LETTERS = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def build_vocab(seed: int = 42, size: int = VOCAB_SIZE) -> tuple[np.ndarray, np.ndarray]:
    """(vocab words, Zipf CDF) — rebuilt identically on every partition."""
    key = (seed, size)
    if key in _VOCAB_CACHE:
        return _VOCAB_CACHE[key]
    rng = np.random.default_rng([seed, 1337])
    lengths = rng.integers(3, 10, size=size)
    maxlen = int(lengths.max())
    mat = _LETTERS[rng.integers(0, 26, size=(size, maxlen))]
    words = np.array(
        ["".join(mat[i, : lengths[i]]) for i in range(size)], dtype=object
    )
    ranks = np.arange(1, size + 1, dtype=np.float64)
    probs = ranks ** (-ZIPF_S)
    cdf = np.cumsum(probs / probs.sum())
    _VOCAB_CACHE[key] = (words, cdf)
    return words, cdf


def _gen_convs(conv_indices: np.ndarray, seed: int) -> pd.DataFrame:
    """Generate all turns for the given conversation indices."""
    words, cdf = build_vocab(seed)
    roles_pool = np.array(["user", "assistant", "tool"], dtype=object)
    out_conv, out_turn, out_role, out_text, out_tool, out_ts = [], [], [], [], [], []
    for i in conv_indices:
        i = int(i)
        rng = np.random.default_rng([seed, i])
        n_turns = int(rng.integers(2, MAX_TURNS + 1))
        # log-normal token counts, mean ≈ 40, tail to ~2000
        n_tokens = np.clip(
            rng.lognormal(mean=3.4, sigma=0.9, size=n_turns).astype(np.int64) + 1,
            1,
            2000,
        )
        total = int(n_tokens.sum())
        tok_idx = np.searchsorted(cdf, rng.random(total))
        toks = words[tok_idx]
        bounds = np.concatenate(([0], np.cumsum(n_tokens)))
        texts = [" ".join(toks[bounds[t] : bounds[t + 1]]) for t in range(n_turns)]
        roles = roles_pool[rng.integers(0, 3, size=n_turns)]
        roles[0] = "user"
        tools = [
            TOOL_NAMES[int(rng.integers(0, len(TOOL_NAMES)))] if r == "tool" else ""
            for r in roles
        ]
        ts = EPOCH_NS + (np.int64(i) * MAX_TURNS + np.arange(n_turns)) * STEP_NS
        out_conv.append(np.repeat(f"c{i:08d}", n_turns))
        out_turn.append(np.arange(n_turns, dtype=np.int32))
        out_role.append(roles)
        out_text.append(np.array(texts, dtype=object))
        out_tool.append(np.array(tools, dtype=object))
        out_ts.append(ts)
    if not out_conv:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "turn_idx": pd.Series([], dtype=np.int32),
                "role": pd.Series([], dtype=object),
                "text": pd.Series([], dtype=object),
                "tool": pd.Series([], dtype=object),
                "ts": pd.Series([], dtype="datetime64[ns]"),
            }
        )
    return pd.DataFrame(
        {
            "conv_id": np.concatenate(out_conv),
            "turn_idx": np.concatenate(out_turn),
            "role": np.concatenate(out_role),
            "text": np.concatenate(out_text),
            "tool": np.concatenate(out_tool),
            "ts": pd.to_datetime(np.concatenate(out_ts)),
        }
    )


def generate_transcripts_pandas(n_convs: int, seed: int = 42) -> pd.DataFrame:
    """Single-process generation (tests, oracle input)."""
    return _gen_convs(np.arange(n_convs), seed)


def generate_transcripts(
    spark: SparkSession, n_convs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed generation: spark.range over conv indices →
    mapInPandas. Deterministic regardless of partitioning."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield _gen_convs(pdf["id"].to_numpy(), seed)

    return (
        spark.range(0, n_convs, numPartitions=partitions)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )

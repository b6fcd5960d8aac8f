"""Caller-managed lifecycle for persisted intermediates (ADVICE r3).

Operators that must persist() an intermediate (it feeds two or more
downstream subtrees) cannot unpersist it before returning — the result
DataFrame is lazy and still references the cached plan. Instead they
pin the handle on the returned DataFrame; the caller releases it once
the result is materialized (collected / written). Same pattern as
operators/docmap.unpersist_intermediates, generalized to any operator
and any number of handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin(df: DataFrame, *handles: DataFrame) -> DataFrame:
    """Attach persisted intermediates to ``df`` for later release."""
    existing = list(getattr(df, "_zs_pinned_list", []))
    df._zs_pinned_list = existing + list(handles)  # noqa: SLF001
    return df


def release(df: DataFrame) -> None:
    """Unpersist every intermediate pinned on ``df`` (no-op if none).
    Call AFTER the result has been materialized."""
    for h in getattr(df, "_zs_pinned_list", []) or []:
        try:
            h.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    df._zs_pinned_list = []  # noqa: SLF001

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from zensearch_spark.session import get_spark

    s = get_spark(app="zensearch-tests", cores=8, shuffle_partitions=8,
                  driver_mem=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    yield s


@pytest.fixture(scope="session")
def small_corpus_pdf():
    from zensearch_spark.sources.corpus import generate_transcripts_pandas

    return generate_transcripts_pandas(n_convs=200, seed=42)

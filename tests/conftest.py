import os
import sys

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test startup lean
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)


@pytest.fixture(scope="session")
def spark():
    from searchengine_spark.session import get_spark

    s = get_spark("searchengine-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """Tiny transcripts corpus keyed by doc_key, with oracle twin."""
    from searchengine_spark.fixtures import doc_key_col, transcripts_df

    df = transcripts_df(spark, "tiny").withColumn("doc_id", doc_key_col())
    return df.select("doc_id", "text", "conv_id", "turn_idx").persist()


@pytest.fixture(scope="session")
def small_corpus(spark):
    from searchengine_spark.fixtures import doc_key_col, transcripts_df

    df = transcripts_df(spark, "small").withColumn("doc_id", doc_key_col())
    return df.select("doc_id", "text", "conv_id", "turn_idx").persist()

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # fast session for tests


@pytest.fixture(scope="session")
def spark():
    from duke_spark.config import get_spark
    s = get_spark("duke_spark_tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ctx_bc(spark):
    from duke_spark.pipeline import make_context
    return make_context(spark)


@pytest.fixture(scope="session")
def oracle_ctx():
    from duke_spark.fixtures.class_tree import mini_tree
    from duke_spark.fixtures.embedding import build_embedding
    from duke_spark.kernel.oracle import OracleContext
    return OracleContext(build_embedding(), mini_tree())


@pytest.fixture(scope="session")
def tiny_transcripts_pdf():
    from duke_spark.fixtures.transcripts import generate_transcripts
    return generate_transcripts(n_convs=20, max_turns=12, seed=42,
                                hot_frac=0.3)


@pytest.fixture(scope="session")
def tiny_transcripts(spark, tiny_transcripts_pdf):
    from duke_spark.fixtures.transcripts import spark_transcripts
    return spark_transcripts(spark, tiny_transcripts_pdf)

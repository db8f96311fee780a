import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hermes_spark import build_session  # noqa: E402
from hermes_spark.tables import scratch_dir  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="hermes_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def tmp_work():
    d = scratch_dir("hermes-test")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def transcripts_pdf():
    from hermes_spark.fixtures import TranscriptConfig, generate_transcripts

    return generate_transcripts(TranscriptConfig(n_convs=60, mega_len=600))


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    from hermes_spark.schema import TRANSCRIPT_SCHEMA

    return spark.createDataFrame(transcripts_pdf, TRANSCRIPT_SCHEMA).cache()

import pytest

from sparklink.session import get_spark
from sparklink.synth import make_labeled_pairs, make_transcripts


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="sparklink-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s


@pytest.fixture(scope="session")
def fixture_pd():
    transcripts, truth = make_transcripts(n_entities=80, seed=42)
    labeled = make_labeled_pairs(truth, transcripts, seed=42)
    return transcripts, truth, labeled


@pytest.fixture(scope="session")
def fixture_dfs(spark, fixture_pd):
    transcripts, truth, labeled = fixture_pd
    return (
        spark.createDataFrame(transcripts).cache(),
        spark.createDataFrame(truth).cache(),
        spark.createDataFrame(labeled).cache(),
    )

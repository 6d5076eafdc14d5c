"""Ragged-CSV repair scan + data-repair filters + training-pair sampling."""

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType


def test_read_csv_repair_drops_ragged_rows(spark, tmp_path):
    from sparklink.sources import read_csv_repair

    p = tmp_path / "raw.tsv"
    p.write_text(
        "id\tname\tcity\n"
        "1\tJosé\tChicago\n"
        "2\tbroken row with missing col\n"  # 2 cols -> dropped? (1 sep)
        "3\tMüller\tBerlin\textra\textra2\n"  # 5 cols -> dropped
        "4\tplain\tNYC\n"
    )
    schema = StructType(
        [StructField("id", IntegerType()), StructField("name", StringType()), StructField("city", StringType())]
    )
    df = read_csv_repair(spark, str(p), schema, sep="\t", ascii_fold_cols=["name"])
    rows = {r.id: (r.name, r.city) for r in df.collect()}
    assert 3 not in rows  # ragged row dropped
    assert rows[1] == ("Jose", "Chicago")  # accent folded
    assert rows[4] == ("plain", "NYC")


def test_repair_filters(spark):
    from sparklink.sources import repair_filters

    df = spark.createDataFrame(
        [("C001", "01/02/2020"), ("", "01/02/2020"), ("C123456789X", "01/02/2020"), ("C9", "1/2/20")],
        "committee_id string, date string",
    )
    out = repair_filters(df, date_col="date", key_col="committee_id")
    rows = {r.committee_id: r.date for r in out.collect()}
    assert set(rows) == {"C001", "C9"}
    assert rows["C001"] == "01/02/2020"
    assert rows["C9"] is None  # short date NULLified


def test_sample_training_pairs(spark, fixture_dfs):
    from sparklink.canonicalize import canonicalize
    from sparklink.learn import sample_training_pairs
    from sparklink.pipeline import default_transcript_predicates

    transcripts, *_ = fixture_dfs
    records = canonicalize(transcripts)
    pairs = sample_training_pairs(records, default_transcript_predicates(), n_random=50, n_blocked=50)
    pdf = pairs.toPandas()
    assert 50 <= len(pdf) <= 100
    assert (pdf.conv_id_a < pdf.conv_id_b).all()
    # deterministic across invocations
    pdf2 = sample_training_pairs(records, default_transcript_predicates(), n_random=50, n_blocked=50).toPandas()
    assert sorted(map(tuple, pdf.values.tolist())) == sorted(map(tuple, pdf2.values.tolist()))

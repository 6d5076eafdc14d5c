"""Field-model variable kinds vs hand-computed values (SURVEY §2.6):
Price, LatLong (Haversine), Set (Jaccard), Exact/Categorical, Interaction,
missing-data dummies."""

import math

import pytest
from pyspark.sql import functions as F

from sparklink.score import FieldModel, Variable


@pytest.fixture(scope="module")
def hydrated(spark):
    rows = [
        # id_a, id_b, price_a, price_b, lat_a, lng_a, lat_b, lng_b,
        # tags_a, tags_b, cat_a, cat_b
        ("a", "b", 100.0, 80.0, 41.88, -87.63, 40.71, -74.01, ["x", "y"], ["y", "z"], "police", "police"),
        ("c", "d", 50.0, 50.0, 48.85, 2.35, 48.85, 2.35, ["x"], ["x"], "fire", "police"),
        ("e", "f", None, 10.0, 0.0, 0.0, 1.0, 1.0, None, ["x"], None, "police"),
    ]
    df = spark.createDataFrame(
        rows,
        "id_a string, id_b string, price_a double, price_b double, lat_a double, lng_a double,"
        "lat_b double, lng_b double, tags_a array<string>, tags_b array<string>, cat_a string, cat_b string",
    )
    return df.withColumn("loc_a", F.struct(F.col("lat_a").alias("lat"), F.col("lng_a").alias("lng"))).withColumn(
        "loc_b", F.struct(F.col("lat_b").alias("lat"), F.col("lng_b").alias("lng"))
    )


def test_price_latlong_set_categorical(hydrated):
    model = FieldModel(
        variables=[
            Variable("price", "price"),
            Variable("loc", "latlong"),
            Variable("tags", "jaccard"),
            Variable("cat", "categorical"),
        ]
    )
    out = model.distance_frame(hydrated).toPandas().set_index("id_a")
    # price: |100-80|/100 = 0.2
    assert abs(out.loc["a", "d_price_price"] - 0.2) < 1e-9
    assert out.loc["c", "d_price_price"] == 0.0
    assert out.loc["e", "d_price_price"] == 0.0 and out.loc["e", "m_d_price_price"] == 0.0
    # latlong: Chicago -> NYC ~ 1145 km => sim = 1/(1+d)
    d_ab = out.loc["a", "d_latlong_loc"]
    assert abs(1.0 / d_ab - 1.0 - 1145.0) < 30.0
    assert abs(out.loc["c", "d_latlong_loc"] - 1.0) < 1e-9
    # jaccard: |{y}|/|{x,y,z}| = 1/3
    assert abs(out.loc["a", "d_jaccard_tags"] - 1.0 / 3.0) < 1e-9
    # categorical
    assert out.loc["a", "d_categorical_cat"] == 1.0
    assert out.loc["c", "d_categorical_cat"] == 0.0
    # missing dummies flag presence
    assert out.loc["a", "m_d_jaccard_tags"] == 1.0
    assert out.loc["e", "m_d_jaccard_tags"] == 0.0


def test_interaction_terms(hydrated):
    model = FieldModel(
        variables=[Variable("price", "price"), Variable("cat", "categorical")],
        interactions=[("price(price)", "categorical(cat)")],
    )
    out = model.distance_frame(hydrated).toPandas().set_index("id_a")
    x = out["x_price(price)__categorical(cat)"]
    assert abs(x.loc["a"] - 0.2 * 1.0) < 1e-9
    assert x.loc["c"] == 0.0
    assert "x_price(price)__categorical(cat)" in model.feature_cols()


def test_score_expr_uses_all_features(hydrated):
    import numpy as np

    model = FieldModel(variables=[Variable("price", "price"), Variable("cat", "categorical")])
    model.weights = np.array([1.0, 2.0, 0.5, 0.5])
    model.bias = -1.0
    out = model.score(model.distance_frame(hydrated)).toPandas().set_index("id_a")
    z = 1.0 * 0.2 + 2.0 * 1.0 + 0.5 * 1.0 + 0.5 * 1.0 - 1.0
    assert abs(out.loc["a", "score"] - 1.0 / (1.0 + math.exp(-z))) < 1e-9

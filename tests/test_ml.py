"""One-pass ridge trainer: recovers known coefficients, matches the
NumPy closed form exactly, survives dirty rows, and scores map-only."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from map_reduce_using_cloud_functions_spark.operators.ml import (
    fit_ridge,
    score_documents,
)

W_TRUE = [2.0, -3.0, 0.5]
INTERCEPT = 4.0


@pytest.fixture(scope="module")
def regression_df(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(size=(400, 3))
    y = X @ np.array(W_TRUE) + INTERCEPT + rng.normal(0, 0.01, 400)
    rows = [(i, [float(v) for v in X[i]], float(y[i])) for i in range(400)]
    return spark.createDataFrame(
        rows, "id bigint, feats array<double>, label double"
    )


def test_recovers_planted_coefficients(regression_df):
    w = fit_ridge(regression_df, "feats", "label", dim=3)
    assert len(w) == 4
    for got, want in zip(w, W_TRUE + [INTERCEPT]):
        assert abs(got - want) < 0.01


def test_matches_numpy_closed_form_exactly(regression_df):
    l2 = 0.7
    w = fit_ridge(regression_df, "feats", "label", dim=3, l2=l2)
    rows = regression_df.collect()
    X = np.array([list(r["feats"]) + [1.0] for r in rows])
    y = np.array([r["label"] for r in rows])
    reg = l2 * np.eye(4)
    reg[3, 3] = 0.0
    want = np.linalg.solve(X.T @ X + reg, X.T @ y)
    assert np.allclose(w, want, rtol=1e-9, atol=1e-9)


def test_partition_invariance(regression_df):
    w1 = fit_ridge(regression_df.repartition(1), "feats", "label", dim=3)
    w32 = fit_ridge(regression_df.repartition(32), "feats", "label", dim=3)
    assert np.allclose(w1, w32, rtol=1e-9, atol=1e-12)


def test_dirty_rows_dropped(spark, regression_df):
    dirty = spark.createDataFrame(
        [
            (9001, None, 1.0),
            (9002, [1.0, 2.0], 1.0),  # wrong length
            (9003, [1.0, 2.0, 3.0], None),
        ],
        "id bigint, feats array<double>, label double",
    )
    w_clean = fit_ridge(regression_df, "feats", "label", dim=3)
    w_dirty = fit_ridge(regression_df.unionByName(dirty), "feats", "label", dim=3)
    assert np.allclose(w_clean, w_dirty)
    with pytest.raises(ValueError, match="no valid rows"):
        fit_ridge(dirty, "feats", "label", dim=3)


def test_null_feature_elements_dropped(spark, regression_df):
    """A right-length array with a null ELEMENT must be dropped whole:
    F.sum skips nulls per-aggregate, so such a row would otherwise
    contribute to some Gram entries but not others and silently skew
    the solve (r3 advisor finding)."""
    poisoned = spark.createDataFrame(
        [(9004, [1.0, None, 3.0], 100.0)],
        "id bigint, feats array<double>, label double",
    )
    w_clean = fit_ridge(regression_df, "feats", "label", dim=3)
    w_poisoned = fit_ridge(
        regression_df.unionByName(poisoned), "feats", "label", dim=3
    )
    assert np.allclose(w_clean, w_poisoned)


def test_scoring_is_map_only_and_correct(regression_df):
    w = fit_ridge(regression_df, "feats", "label", dim=3)
    scored = score_documents(regression_df, "feats", w)
    # predictions track labels tightly (noise sd 0.01)
    err = scored.select(
        F.max(F.abs(F.col("model_score") - F.col("label"))).alias("e")
    ).first()["e"]
    assert err < 0.05
    plan = scored._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        scored._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan


def test_quality_model_pipeline_end_to_end(spark):
    """Composed learned filter: self-supervised mode recovers the
    heuristic quality near-exactly (quality IS linear in the features
    up to clamping), labeled mode respects the labels, and the
    threshold gates."""
    from map_reduce_using_cloud_functions_spark.operators.pipelines import (
        quality_model_pipeline,
    )
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    scored, w = quality_model_pipeline(docs)
    assert len(w) == 10  # 9 features + intercept
    n = scored.count()
    assert n > 0
    # self-supervised: model_score tracks the heuristic target tightly
    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        text_features,
    )

    joined = scored.join(
        text_features(docs).select("doc_id", "quality"), "doc_id"
    )
    mae = joined.select(
        F.avg(F.abs(F.col("model_score") - F.col("quality"))).alias("e")
    ).first()["e"]
    assert mae < 0.1

    gated, _ = quality_model_pipeline(docs, threshold=0.5)
    assert 0 < gated.count() < n

    # labeled mode: constant labels -> constant predictions
    labels = docs.select("doc_id", F.lit(0.7).alias("label")).limit(200)
    scored_l, w_l = quality_model_pipeline(docs, labeled_ids=labels)
    spread = scored_l.select(
        (F.max("model_score") - F.min("model_score")).alias("s")
    ).first()["s"]
    assert spread < 1e-4

"""The fused hybrid plan (round 5) must be row-identical to the staged
operator composition — the reference's own hybrid==direct golden
(ner_app_test.py:51-81) extended to cover the fusion, plus a plan-shape
assertion that the fusion actually is zero-exchange."""

from hebrew_ner_spark.querydefs.hybrid_q import (
    hybrid_pipeline,
    hybrid_pipeline_staged,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_equals_staged(spark, sf_dir):
    fused = hybrid_pipeline(spark, sf_dir)
    staged = hybrid_pipeline_staged(spark, sf_dir)
    assert fused.columns == staged.columns
    assert _rows(fused) == _rows(staged)


def test_fused_plan_has_no_exchange(spark, sf_dir):
    plan = hybrid_pipeline(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

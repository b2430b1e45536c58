"""Plug-in seam tests (VERDICT r4 #8).

Three kernels are environment-blocked fakes (no HF weights, no LLM
credentials, no media codecs in this container). Their guards must be
LOUD and ACTIONABLE: the raise message names the exact function a user
replaces to slot in the real kernel, so shipping with weights/keys/
codecs is a one-function change, not an archaeology project.
"""

from __future__ import annotations

import pytest


def test_hfinfer_seam_names_plug_in_point(spark):
    from risk_dashboard_database_spark.functions.hfinfer import infer_batch

    df = spark.createDataFrame([("hello",)], "text string")
    with pytest.raises(NotImplementedError) as ei:
        infer_batch(df, "text", backend="distilbert")
    msg = str(ei.value)
    assert "distilbert" in msg
    assert "_fake_model" in msg
    assert "risk_dashboard_database_spark.functions.hfinfer" in msg


def test_llm_seam_names_plug_in_point(spark):
    from risk_dashboard_database_spark.functions.llm import classify_batch

    df = spark.createDataFrame([("hello",)], "text string")
    with pytest.raises(NotImplementedError) as ei:
        classify_batch(df, "text", backend="openai")
    msg = str(ei.value)
    assert "openai" in msg
    assert "fake_classify" in msg
    assert "risk_dashboard_database_spark.functions.llm" in msg


def test_decode_seam_names_plug_in_point():
    from risk_dashboard_database_spark.plans.multimodal import decode_media

    with pytest.raises(NotImplementedError) as ei:
        decode_media(b"\x89PNG", "png")
    msg = str(ei.value)
    assert "png" in msg
    assert "decode_media" in msg
    assert "risk_dashboard_database_spark.plans.multimodal" in msg


# --- real-kernel smokes (VERDICT r5 #8) -------------------------------
# Activate with SPARK_GRAFT_REAL_KERNELS=1 in a container that ships
# the real packages; in this sandbox they skip. They keep the seams
# honest: if the package ever appears, the real path must produce the
# fake path's exact schema, or the seam wiring is flagged immediately.

_REAL = __import__("os").environ.get("SPARK_GRAFT_REAL_KERNELS") == "1"


@pytest.mark.skipif(not _REAL, reason="SPARK_GRAFT_REAL_KERNELS not set")
def test_real_vader_smoke():
    vader = pytest.importorskip("vaderSentiment.vaderSentiment")
    import pandas as pd

    from risk_dashboard_database_spark.functions.sentiment import (
        sentiment_batch,
        sentiment_builtin,
    )

    texts = pd.Series(["great success", "terrible crisis", "", None])
    real = sentiment_batch(texts)      # real path: package importable
    fake = sentiment_builtin(texts)
    assert str(real.dtype) == str(fake.dtype) == "float64"
    assert real.between(-1.0, 1.0).all()
    # sign agreement on unambiguous inputs (lexicons differ in value,
    # not in polarity of these words)
    assert real.iloc[0] > 0 > real.iloc[1]
    assert vader.SentimentIntensityAnalyzer is not None


@pytest.mark.skipif(not _REAL, reason="SPARK_GRAFT_REAL_KERNELS not set")
def test_real_hf_smoke(spark):
    pytest.importorskip("transformers")
    from risk_dashboard_database_spark.functions.hfinfer import infer_batch

    df = spark.createDataFrame([("hello",), ("bad news",)], "text string")
    fake = infer_batch(df, "text", backend="fake")
    # With weights present the real backend must return the SAME
    # schema as the fake; a NotImplementedError here means the seam
    # still needs its one-function wiring - the loud signal we want.
    real = infer_batch(df, "text", backend="distilbert")
    assert real.schema == fake.schema
    assert real.count() == 2

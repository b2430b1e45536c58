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

"""PII redaction: masks the span, preserves surrounding text, counts
per kind — all pure regex Columns (codegen, no Python)."""

import pytest
from pyspark.sql import functions as F

from cdc_redshift_spark.functions.text import pii_counts, redact_pii


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "contact alice.smith+x@example.co.uk or call 415-555-1234 now"),
        (2, "ssn 123-45-6789 leaked from host 192.168.0.1"),
        (3, "clean text with no identifiers at all"),
        (4, "two mails: a@b.io and c.d@e-f.org"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redaction_masks_and_preserves(docs):
    out = {
        r["doc_id"]: r["red"]
        for r in docs.select(
            "doc_id", redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    assert out[1] == "contact [EMAIL] or call [PHONE] now"
    assert out[2] == "ssn [SSN] leaked from host [IPV4]"
    assert out[3] == "clean text with no identifiers at all"
    assert out[4] == "two mails: [EMAIL] and [EMAIL]"


def test_counts_per_kind(docs):
    got = {
        r["doc_id"]: r["c"].asDict()
        for r in docs.select("doc_id", pii_counts(F.col("text")).alias("c")).collect()
    }
    assert got[1] == {"email": 1, "phone": 1, "ssn": 0, "ipv4": 0}
    assert got[2]["ssn"] == 1 and got[2]["ipv4"] == 1
    assert got[3] == {"email": 0, "phone": 0, "ssn": 0, "ipv4": 0}
    assert got[4]["email"] == 2


def test_empty_kinds_redacts_nothing(docs):
    out = {
        r["doc_id"]: r["red"]
        for r in docs.select(
            "doc_id", redact_pii(F.col("text"), kinds=[]).alias("red")
        ).collect()
    }
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert out == raw  # explicit [] means "redact nothing", not "all"


def test_redaction_is_codegen_only(docs):
    plan = (
        docs.select(redact_pii(F.col("text")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan

"""PII scan/redaction vs hand oracles, including the dialect-parity check
that the identical pattern strings behave the same in DuckDB (the driver
oracle's engine)."""

import duckdb
import pytest

from pagerank_barrierfree_openmp_dynamic_spark.functions import (
    PII_PATTERNS,
    pii_scan,
    redact_pii,
)

DOCS = [
    (1, "write to alice.smith+x@mail.example.org today"),
    (2, "ssn 123-45-6789 phone 555-123-4567 and 555.123.4567"),
    (3, "server at 10.0.0.1 and 192.168.255.12, version 1.2"),
    (4, "clean text with no identifiers at all"),
    (5, ""),
    (6, None),
    (7, "two mails a@b.co c@d.io one ip 8.8.8.8"),
]


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_pii_scan_hand_oracle(spark, docs_df):
    got = _by_id(pii_scan(docs_df))
    assert got[1] == {"doc_id": 1, "n_email": 1, "n_ssn": 0, "n_phone": 0,
                      "n_ipv4": 0, "pii_total": 1}
    assert got[2] == {"doc_id": 2, "n_email": 0, "n_ssn": 1, "n_phone": 2,
                      "n_ipv4": 0, "pii_total": 3}
    assert got[3] == {"doc_id": 3, "n_email": 0, "n_ssn": 0, "n_phone": 0,
                      "n_ipv4": 2, "pii_total": 2}
    for i in (4, 5, 6):
        assert got[i]["pii_total"] == 0
    assert got[7]["n_email"] == 2 and got[7]["n_ipv4"] == 1


def test_redact_hand_oracle(spark, docs_df):
    got = _by_id(redact_pii(docs_df))
    assert got[1]["text"] == "write to <EMAIL> today"
    assert got[1]["n_redacted"] == 1
    assert got[2]["text"] == "ssn <SSN> phone <PHONE> and <PHONE>"
    assert got[3]["text"] == "server at <IPV4> and <IPV4>, version 1.2"
    # clean text passes through byte-identical
    assert got[4]["text"] == DOCS[3][1]
    assert got[4]["n_redacted"] == 0
    assert got[5]["text"] == "" and got[6]["text"] is None


def test_ssn_not_eaten_by_phone(spark):
    # 3-2-4 must redact as SSN, 3-3-4 as phone; ordering in PII_PATTERNS
    # guarantees the SSN pattern runs first.
    df = spark.createDataFrame([(1, "ids 111-22-3333 111-222-3333")],
                               "doc_id long, text string")
    row = redact_pii(df).collect()[0]
    assert row["text"] == "ids <SSN> <PHONE>"


def test_dialect_parity_with_duckdb(spark, docs_df):
    """The driver oracle runs the same pattern strings under RE2; counts
    must agree with Spark's Java regex on every fixture row."""
    con = duckdb.connect()
    spark_rows = _by_id(pii_scan(docs_df))
    for doc_id, text in DOCS:
        for name, pat in PII_PATTERNS:
            duck = con.execute(
                "SELECT len(regexp_extract_all(coalesce(?, ''), ?))",
                [text, pat],
            ).fetchone()[0]
            assert duck == spark_rows[doc_id][f"n_{name}"], (doc_id, name)
    con.close()

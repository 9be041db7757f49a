"""PII redaction: golden redactions on hand-built strings (boundary cases
the synthetic driver payload can't exercise) and row-exact cross-engine
parity of the full demo-payload query."""

from __future__ import annotations

import duckdb
import pytest

from language_diversity_common_crawler_spark.functions import pii

ROWS = [
    (1, "write to Bob.Smith+spam@sub.Example.co.uk today"),
    (2, "servers 10.0.0.1 and 192.168.255.254, port 8080"),
    (3, "call +1-555-0100 or +44 555 0199 now"),
    (4, "no pii here, just words and 1234 numbers"),
    (5, None),
    (6, ""),
    # version strings must NOT match IPv4 (only 3 dots + digits do);
    # 1.2.3.4.5 greedily redacts its first 4 octets (documented behavior)
    (7, "v1.2.3 released; node 1.2.3.4.5 is odd"),
    (8, "two mails a@b.io c@d.ai one ip 8.8.8.8"),
    # pre-existing literal placeholder tokens must NOT inflate counts
    (9, "fake token <IP> and real 1.2.3.4 plus <EMAIL> text"),
]

EXPECTED = {
    1: ("write to <EMAIL> today", 1, 0, 0),
    2: ("servers <IP> and <IP>, port 8080", 0, 2, 0),
    3: ("call <PHONE> or <PHONE> now", 0, 0, 2),
    4: ("no pii here, just words and 1234 numbers", 0, 0, 0),
    5: (None, None, None, None),
    6: ("", 0, 0, 0),
    7: ("v1.2.3 released; node <IP>.5 is odd", 0, 1, 0),
    8: ("two mails <EMAIL> <EMAIL> one ip <IP>", 2, 1, 0),
    9: ("fake token <IP> and real <IP> plus <EMAIL> text", 0, 1, 0),
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", ROWS)
    return con


def _spark_rows(spark):
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    out = pii.with_pii_redaction(df, "text")
    return {r["doc_id"]: r for r in out.collect()}


def test_golden_redactions(spark):
    got = _spark_rows(spark)
    for did, (red, ne, ni, np_) in EXPECTED.items():
        r = got[did]
        assert r["redacted"] == red, (did, r["redacted"])
        assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (ne, ni, np_), did


def test_duckdb_parity_golden(duck):
    sql = pii.sql_pii_redaction("documents", payload="text")
    for doc_id, red, ne, ni, np_ in duck.execute(sql).fetchall():
        assert (red, ne, ni, np_) == EXPECTED[doc_id], doc_id


def test_demo_payload_null_text_parity(spark, duck):
    """NULL text must produce the SAME payload in both engines (DuckDB
    concat skips NULLs; the coalesce in demo_payload_expr pins it)."""
    d = duck.execute(
        "SELECT doc_id, " + pii.demo_payload_expr("duckdb")
        + " FROM documents WHERE doc_id = 5"
    ).fetchone()
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    s = (
        df.filter("doc_id = 5")
        .selectExpr("doc_id", pii.demo_payload_expr("spark"))
        .collect()[0]
    )
    assert d[1] == s[1] and d[1] is not None


def test_pii_fuzz_three_way(spark):
    """Seeded fuzz: Spark, DuckDB, and a Python `re` mirror of the staged
    count-then-replace algorithm agree byte-for-byte on 300 adversarial
    fragment soups (emails abutting IPs, literal placeholder tokens,
    over-long octets, version strings, partial phones)."""
    import random
    import re

    import duckdb

    rng = random.Random(20260820)
    frags = [
        "word", "a@b.io", "x.y+z@mail.example.com", "1.2.3.4", "10.0.0.256",
        "+1-555-1234", "+44 555 0199", "<EMAIL>", "<IP>", "<PHONE>",
        "999.999.999.999", "v1.2.3", "a@b", ".", "@", "1.2.3.4.5",
        "tel:", "+1-55-1234", "user@-x.com", "a@b.c-d.org",
    ]
    texts = [
        " ".join(rng.choice(frags) for _ in range(rng.randint(0, 12)))
        for _ in range(300)
    ]

    def py_pii(t):
        s = t
        counts = []
        for token, pat, _ in pii.CLASSES:
            counts.append(sum(1 for _ in re.finditer(pat, s)))
            s = re.sub(pat, token, s)
        return (s, *counts)

    want = {i: py_pii(t) for i, t in enumerate(texts)}

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["redacted"], r["n_emails"], r["n_ips"], r["n_phones"])
        for r in pii.with_pii_redaction(df, "text").collect()
    }
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    duck = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            pii.sql_pii_redaction("documents", payload="text")
        ).fetchall()
    }
    assert duck == want

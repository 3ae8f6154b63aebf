"""PII detection/redaction (functions/pii.py) — including the
cross-engine (Java regex vs RE2) differential that justifies the exact
oracle."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from pfutil_spark.functions.pii import (
    PII_PATTERNS,
    pii_redact_col,
    pii_scan,
    sql_pii_count_expr,
    sql_pii_redact_expr,
)

CURATED = [
    (0, "reach me at jane.doe+spam@example.co.uk or at work"),
    (1, "server 10.0.42.7 and 192.168.1.255 are up"),
    (2, "call 555-123-4567 or 555 987 6543 today"),
    (3, "token deadbeefdeadbeefdeadbeefdeadbeef in the log"),
    (4, "clean text with no pii at all, 3.14 and v1.2.3 stay"),
    (5, "a@b.c.d is not an address; x@y.io is"),
    (6, ""),
    (7, None),
    (8, "mixed: bob@corp.net from 8.8.8.8 ran 111-222-3333 with "
        "0123456789abcdef0123456789abcdef0123456789abcdef"),
]


class TestPii:
    def test_curated_counts_and_redaction(self, spark):
        df = spark.createDataFrame(CURATED, "id long, text string")
        rows = {r["id"]: r for r in pii_scan(df).collect()}
        assert rows[0]["n_pii_email"] == 1 and rows[0]["n_pii_total"] == 1
        assert rows[1]["n_pii_ipv4"] == 2
        assert rows[2]["n_pii_phone"] == 2
        assert rows[3]["n_pii_hex_secret"] == 1
        assert rows[4]["n_pii_total"] == 0 and rows[4]["chars_redacted"] == 0
        assert rows[5]["n_pii_email"] == 1
        assert rows[6]["n_pii_total"] == 0
        assert rows[7]["n_pii_total"] is None
        assert rows[8]["n_pii_total"] == 4
        red = {
            r["id"]: r["r"]
            for r in df.select("id", pii_redact_col("text").alias("r")).collect()
        }
        assert red[0] == "reach me at <EMAIL> or at work"
        assert red[1] == "server <IP> and <IP> are up"
        assert red[8] == "mixed: <EMAIL> from <IP> ran <PHONE> with <SECRET>"
        assert red[7] is None

    def test_differential_vs_duckdb(self, spark):
        # deterministic fuzz: interleave pii-ish fragments with noise,
        # boundary cases (no spaces, punctuation hugs), then demand
        # EXACT agreement on every count and every redacted string
        frags = [
            "x@y.zz", "a.b@c.dd.ee", "nope@", "@nope", "1.2.3.4", "12.34.56.789",
            "1234.5.6.7", "999-999-9999", "12-345-6789", "cafebabe" * 4,
            "CAFEBABE" * 4, "deadbeef" * 3, "tail", "(a@b.cc)", "ip:10.0.0.1.",
            "e.g.x@mail-host.org,", "v1.2.3.4b", "0" * 35,
        ]
        rows = []
        for i in range(200):
            parts = [frags[(i * 7 + j * 13) % len(frags)] for j in range(1 + i % 5)]
            sep = [" ", ", ", "  ", " word "][i % 4]
            rows.append((i, sep.join(parts)))
        df = spark.createDataFrame(rows, "id long, text string")
        got = (
            pii_scan(df)
            .select(
                "id",
                *[f"n_pii_{k}" for k, _, _ in PII_PATTERNS],
                pii_redact_col("text").alias("redacted"),
            )
            .orderBy("id")
            .toPandas()
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame(rows, columns=["id", "text"]))
        sel = ", ".join(
            f"CAST({sql_pii_count_expr('text', k)} AS BIGINT) AS n_pii_{k}"
            for k, _, _ in PII_PATTERNS
        )
        want = con.execute(
            f"SELECT id, {sel}, {sql_pii_redact_expr('text')} AS redacted"
            " FROM t ORDER BY id"
        ).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_map_only_plan(self, spark):
        from tests.test_plans import plan_of

        df = spark.createDataFrame([(1, "a@b.cc")], "id long, text string")
        plan = plan_of(pii_scan(df))
        assert "Exchange" not in plan
        # no UDF nodes anywhere (the local-list scan itself mentions
        # "applySchemaToPythonRDD", so match the UDF node names)
        assert "EvalPython" not in plan and "MapInArrow" not in plan

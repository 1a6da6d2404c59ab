"""Declarative constraint audit: rule compilation, violation counting,
and the single-scan fusion of row-local rules."""
from __future__ import annotations

import pytest

from jsonl_dataingestion_pipeline_spark.operators.quality import (
    check_constraints,
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
)


@pytest.fixture()
def frame(spark):
    rows = [
        (1, "a@x.io", 10.0, "US"),
        (2, None, 5.0, "DE"),
        (3, "bad-email", -1.0, "FR"),
        (3, "c@y.org", 120.0, "XX"),
        (4, "d@z.net", None, "US"),
    ]
    return spark.createDataFrame(
        rows, "id long, email string, amount double, country string"
    )


def test_rowlocal_rules_count_violations(spark, frame):
    out = {
        r.rule_id: (r.rule, r.n_violations, r.passed)
        for r in check_constraints(
            frame,
            [
                not_null("email"),
                in_range("amount", 0.0, 100.0),
                matches("email", r"^[^@]+@[^@]+\.[a-z]+$"),
                in_set("country", ["US", "DE", "FR"]),
            ],
        ).collect()
    }
    assert out[0] == ("not_null", 1, False)          # one NULL email
    # NULL amount + -1.0 + 120.0 all violate the range
    assert out[1][1] == 3 and not out[1][2]
    # NULL + 'bad-email' fail the regex
    assert out[2][1] == 2
    assert out[3] == ("in_set[US,DE,FR]", 1, False)  # 'XX'


def test_unique_counts_all_participants(spark, frame):
    out = check_constraints(frame, [unique(["id"])]).collect()[0]
    # id 3 appears twice -> BOTH rows count as violations
    assert out.n_violations == 2 and not out.passed


def test_foreign_key_and_pass_flag(spark, frame):
    ref = spark.createDataFrame(
        [(1,), (2,), (3,)], "ref_id long"
    )
    out = check_constraints(
        frame, [foreign_key(["id"], ref, ["ref_id"])]
    ).collect()[0]
    assert out.n_violations == 1 and not out.passed  # id 4
    ok = check_constraints(
        frame,
        [foreign_key(["id"], frame.select("id"), ["id"])],
    ).collect()[0]
    assert ok.n_violations == 0 and ok.passed


def test_rowlocal_rules_fuse_into_one_scan(spark, frame):
    df = check_constraints(
        frame,
        [
            not_null("email"),
            in_range("amount", 0.0, 100.0),
            in_set("country", ["US"]),
        ],
    )
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    tree = (
        df._jdf.queryExecution().explainString(jmode).split("\n\n")[0]
    )
    # all three row-local rules ride ONE aggregate over ONE scan; the
    # 3-row result is that single aggregate unioned with itself
    assert tree.count("Scan ExistingRDD") <= 3
    assert "Join" not in tree


def test_empty_rules_rejected(spark, frame):
    with pytest.raises(ValueError, match="empty rule"):
        check_constraints(frame, [])


# ---------------------------------------------------------------------------
# cohens_kappa (round 8)
# ---------------------------------------------------------------------------
def test_cohens_kappa_hand_computed(spark):
    from jsonl_dataingestion_pipeline_spark.operators.quality import (
        cohens_kappa,
    )

    # classic 2x2: a=(y,y,y,n,n,n,y,n,y,y), b=(y,n,y,n,n,y,y,n,y,n)
    rows = [("y", "y"), ("y", "n"), ("y", "y"), ("n", "n"), ("n", "n"),
            ("n", "y"), ("y", "y"), ("n", "n"), ("y", "y"), ("y", "n")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    n = len(rows)
    agree = sum(1 for a, b in rows if a == b)
    from collections import Counter

    ca, cb = Counter(a for a, _ in rows), Counter(b for _, b in rows)
    s = sum(ca[c] * cb.get(c, 0) for c in ca)
    assert r.ka_n == n and r.ka_agree == agree
    assert r.ka_kappa_u == round((agree * n - s) / (n * n - s) * 1e6)


def test_cohens_kappa_edges(spark):
    from jsonl_dataingestion_pipeline_spark.operators.quality import (
        cohens_kappa,
    )

    # perfect agreement over 2 categories -> kappa 1.0
    df = spark.createDataFrame(
        [("x", "x"), ("y", "y")], "a string, b string"
    )
    assert cohens_kappa(df, "a", "b").collect()[0].ka_kappa_u == 1000000
    # degenerate: one shared category -> p_e = 1, kappa NULL
    df1 = spark.createDataFrame([("x", "x")], "a string, b string")
    assert cohens_kappa(df1, "a", "b").collect()[0].ka_kappa_u is None
    # NULLs agree with NULLs (their own category)
    dfn = spark.createDataFrame(
        [(None, None), ("x", "x"), ("x", None)], "a string, b string"
    )
    r = cohens_kappa(dfn, "a", "b").collect()[0]
    assert r.ka_agree == 2

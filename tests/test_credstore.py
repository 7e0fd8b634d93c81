"""Veramo ORM find-args translator: operator coverage, pagination
semantics, and plan shape (top-K, not global sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.operators.credstore import (
    FindArgs,
    Where,
    credentials_table,
    orm_count,
    orm_find,
)


def test_where_ops(spark, sf_dir):
    creds = credentials_table(spark, sf_dir)
    n_all = creds.count()

    n_in = orm_find(
        creds,
        FindArgs(
            where=(
                Where(
                    "credential_type",
                    ("TradeCredential", "AuthorizationCredential"),
                    "In",
                ),
            )
        ),
    ).count()
    n_eq = orm_find(
        creds, FindArgs(where=(Where("credential_type", ("TradeCredential",)),))
    ).count()
    assert 0 < n_eq < n_in < n_all

    like = orm_find(
        creds, FindArgs(where=(Where("issuer_did", ("%BTCUSDT",), "Like"),))
    )
    assert like.select("issuer_did").distinct().count() == 1

    lo, hi = creds.agg(
        F.min("claim_value"), F.expr("percentile(claim_value, 0.5)")
    ).first()
    between = orm_find(
        creds, FindArgs(where=(Where("claim_value", (lo, hi), "Between"),))
    ).count()
    less = orm_find(
        creds,
        FindArgs(where=(Where("claim_value", (hi,), "LessThanOrEqual"),)),
    ).count()
    assert between == less  # min..p50 == <=p50 (no nulls in claim_value)

    assert (
        orm_find(creds, FindArgs(where=(Where("claim_value", (), "IsNull"),))).count()
        == 0
    )
    with pytest.raises(ValueError, match="unsupported"):
        orm_find(creds, FindArgs(where=(Where("claim_value", (1,), "Regex"),))).count()


def test_count_matches_find(spark, sf_dir):
    creds = credentials_table(spark, sf_dir)
    where = (Where("credential_type", ("ActivityCredential",)),)
    n = orm_count(creds, where).first().n
    assert n == orm_find(creds, FindArgs(where=where)).count()


def test_pagination_is_consistent_and_disjoint(spark, sf_dir):
    creds = credentials_table(spark, sf_dir)
    order = (("issuance_date", "DESC"),)
    page1 = orm_find(creds, FindArgs(order=order, skip=0, take=10)).collect()
    page2 = orm_find(creds, FindArgs(order=order, skip=10, take=10)).collect()
    assert len(page1) == 10 and len(page2) == 10
    h1 = {r.credential_hash for r in page1}
    h2 = {r.credential_hash for r in page2}
    assert not h1 & h2
    # continuous ordering across the page boundary
    assert page1[-1].issuance_date >= page2[0].issuance_date
    # skip beyond the table yields empty, not an error
    big = creds.count()
    assert orm_find(creds, FindArgs(order=order, skip=big, take=5)).count() == 0


def test_pagination_plan_is_topk_not_global_sort(spark, sf_dir):
    creds = credentials_table(spark, sf_dir)
    paged = orm_find(
        creds, FindArgs(order=(("issuance_date", "DESC"),), skip=40, take=20)
    )
    plan = paged._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

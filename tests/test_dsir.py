"""Properties of the DSIR importance-resampling selector (operators/text.py):
budget semantics, classifier quality on the language-labeled corpus, an
independent pure-Python replay of the hashed-bigram log-ratio score, and
the broadcast plan shape."""

from __future__ import annotations

import hashlib
import math

from ssiintegrateddatapipeline_spark.operators.text import (
    DSIR_BUCKETS,
    DSIR_SELECT_K,
    dsir_weights,
)
from ssiintegrateddatapipeline_spark.sources.batch import load_table


def _feat(bigram: str) -> int:
    return int(hashlib.md5(bigram.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS


def _py_dsir(rows):
    """Independent replay: per-doc hashed-bigram feature stream, add-1
    smoothed target/raw bucket LMs, per-doc summed log2 ratio."""
    feats = []  # (doc_id, is_target, f)
    for doc_id, lang, text in rows:
        toks = text.split(" ")
        for a, b in zip(toks, toks[1:]):
            feats.append((doc_id, lang == "en", _feat(f"{a} {b}")))
    c_raw: dict[int, int] = {}
    c_tgt: dict[int, int] = {}
    for _, is_t, f in feats:
        c_raw[f] = c_raw.get(f, 0) + 1
        if is_t:
            c_tgt[f] = c_tgt.get(f, 0) + 1
    n_raw, n_tgt = len(feats), sum(c_tgt.values())
    lr = {
        f: math.log2((c_tgt.get(f, 0) + 1) / (n_tgt + DSIR_BUCKETS))
        - math.log2((c_raw[f] + 1) / (n_raw + DSIR_BUCKETS))
        for f in c_raw
    }
    out: dict[int, list] = {}
    for doc_id, is_t, f in feats:
        acc = out.setdefault(doc_id, [0.0, 0, is_t])
        acc[0] += lr[f]
        acc[1] += 1
    return out


def test_budget_and_ordering(spark, sf_dir):
    rows = dsir_weights(spark, sf_dir).collect()
    assert len(rows) <= DSIR_SELECT_K
    per_tok = [r.logratio_per_tok for r in rows]
    assert per_tok == sorted(per_tok, reverse=True)


def test_selects_mostly_target(spark, sf_dir):
    # the English subset IS the target distribution, so an overwhelming
    # majority of the selected budget must be English documents
    rows = dsir_weights(spark, sf_dir).collect()
    n_target = sum(1 for r in rows if r.is_target)
    assert n_target >= 0.7 * len(rows), (n_target, len(rows))


def test_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    ref = _py_dsir([(r.doc_id, r.lang, r.text) for r in docs])
    got = {r.doc_id: r for r in dsir_weights(spark, sf_dir).collect()}
    for doc_id, row in got.items():
        sum_lr, n_feats, is_t = ref[doc_id]
        assert row.n_feats == n_feats
        assert row.is_target == is_t
        assert abs(row.dsir_logratio - sum_lr) < 1e-5, doc_id


def test_plan_broadcasts_ratio_table(spark, sf_dir):
    plan = (
        dsir_weights(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the <=4096-row log-ratio table must broadcast onto the feature
    # stream; the top-K must be a TakeOrderedAndProject, not a global sort
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan

"""Bigram-LM scoring vs an independent Python (Counter) oracle."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from tile_grid_spark.functions.lm import bigram_lm_scores, doc_bigrams


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the hat"),
        (2, "the dog sat on the mat"),
        (3, "completely unrelated gibberish tokens here"),
        (4, "single"),                      # 1 token -> no bigrams
        (5, "  the   cat  sat  "),          # ragged whitespace
        (6, "the the the the"),             # repetition
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def _python_oracle(rows, add_k=0.5):
    toks = {i: re.split(r"\s+", t.strip().lower()) for i, t in rows}
    uni = Counter(w for ws in toks.values() for w in ws)
    bgs = {
        i: list(zip(ws, ws[1:])) for i, ws in toks.items() if len(ws) >= 2
    }
    bgc = Counter(b for bs in bgs.values() for b in bs)
    vocab = len(uni)
    out = {}
    for i, bs in bgs.items():
        lps = [
            math.log((bgc[b] + add_k) / (uni[b[0]] + add_k * vocab)) for b in bs
        ]
        out[i] = (len(bs), round(sum(lps) / len(lps), 6))
    return out


class TestBigramLm:
    def test_bigrams(self, spark, corpus):
        got = {
            (r.doc_id, r.w1, r.w2) for r in doc_bigrams(corpus).collect()
        }
        assert (0, "the", "cat") in got
        assert (0, "the", "mat") in got
        assert (5, "cat", "sat") in got      # ragged whitespace tokenized
        assert not any(d == 4 for d, _, _ in got)   # 1-token doc dropped
        assert sum(1 for d, _, _ in got if d == 6) == 1  # set view of (the,the)

    def test_scores_match_python(self, spark, corpus):
        rows = [(r.doc_id, r.text) for r in corpus.collect()]
        want = _python_oracle(rows)
        got = {
            r.doc_id: (r.n_bigrams, r.avg_logp)
            for r in bigram_lm_scores(corpus).collect()
        }
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0]
            assert got[i][1] == pytest.approx(want[i][1], abs=2e-6)

    def test_shared_bigrams_outscore_hapax(self, spark, corpus):
        got = {r.doc_id: r.avg_logp for r in bigram_lm_scores(corpus).collect()}
        # docs 0 and 2 differ in ONE bigram pair: (the,cat) has corpus
        # count 3 where (the,dog) is a hapax — doc 0 must score higher
        assert got[0] > got[2]
        # doc 5 is a sub-phrase of the corpus's most-supported trigram
        # ("the cat sat") — the fluency maximum of this fixture
        assert got[5] == max(got.values())

    def test_no_python_in_plan(self, spark, corpus):
        plan = (
            bigram_lm_scores(corpus)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # the vocab scalar must ride as a broadcast, not a driver collect
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

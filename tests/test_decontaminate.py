"""Decontamination + PII scrubbing vs independent python oracles."""

from __future__ import annotations

import re

import pytest


def _py_ngrams(text: str, n: int) -> set:
    toks = re.split(r"\s+", text.strip().lower())
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the quick brown fox naps all afternoon long"),
    (4, "tiny doc"),
    (5, "completely unrelated content about sparkly engines here"),
]
TEST = [
    (100, "quick brown fox jumps over"),       # hits doc 1
    (101, "tiny doc"),                          # whole-text shingle, hits 4
    (102, "nothing matches this eval prompt"),
]


class TestContaminationStats:
    def test_matches_python_oracle(self, spark):
        from tile_grid_spark.operators.decontaminate import contamination_stats

        train = spark.createDataFrame(TRAIN, "doc_id BIGINT, text STRING")
        test = spark.createDataFrame(TEST, "doc_id BIGINT, text STRING")
        n = 3
        got = {
            r.train_id: (r.n_shared_ngrams, r.n_test_docs)
            for r in contamination_stats(train, test, n=n).collect()
        }
        te = {tid: _py_ngrams(t, n) for tid, t in TEST}
        expect = {}
        for tid, t in TRAIN:
            ngs = _py_ngrams(t, n)
            shared = set()
            docs = set()
            for eid, engs in te.items():
                hit = ngs & engs
                if hit:
                    shared |= hit
                    docs.add(eid)
            if shared:
                expect[tid] = (len(shared), len(docs))
        assert got == expect
        assert 1 in got and 4 in got and 5 not in got

    def test_decontaminate_filters(self, spark):
        from tile_grid_spark.operators.decontaminate import (
            contamination_stats,
            decontaminate,
        )

        train = spark.createDataFrame(TRAIN, "doc_id BIGINT, text STRING")
        test = spark.createDataFrame(TEST, "doc_id BIGINT, text STRING")
        bad = {r.train_id for r in contamination_stats(train, test, n=3).collect()}
        kept = {r.doc_id for r in decontaminate(train, test, n=3).collect()}
        assert kept == {tid for tid, _ in TRAIN} - bad
        assert kept and bad

    def test_min_hits_threshold(self, spark):
        from tile_grid_spark.operators.decontaminate import contamination_stats

        train = spark.createDataFrame(TRAIN, "doc_id BIGINT, text STRING")
        test = spark.createDataFrame(TEST, "doc_id BIGINT, text STRING")
        loose = contamination_stats(train, test, n=3, min_hits=1).count()
        tight = contamination_stats(train, test, n=3, min_hits=3).count()
        assert tight < loose


class TestPiiScrub:
    def test_values(self, spark):
        from tile_grid_spark.functions.text import with_pii_scrubbed

        rows = [
            (1, "mail a.b-c_9@sub.example.org now"),
            (2, "server at 192.168.0.1 fell over"),
            (3, "call +44 20 7946 0958 today"),
            (4, "plain text, nothing to hide"),
            (5, "x@y.io and 10.0.0.7 and +1 555 010 2222"),
        ]
        df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        got = {r.doc_id: r for r in with_pii_scrubbed(df).collect()}
        assert got[1].scrubbed == "mail <EMAIL> now"
        assert got[1].n_emails == 1 and got[1].n_ips == 0
        assert got[2].scrubbed == "server at <IP> fell over"
        assert got[3].scrubbed == "call <PHONE> today"
        assert got[4].scrubbed == rows[3][1]
        assert got[5].scrubbed == "<EMAIL> and <IP> and <PHONE>"
        assert (got[5].n_emails, got[5].n_ips, got[5].n_phones) == (1, 1, 1)

    def test_zero_shuffle_plan(self, spark):
        from tile_grid_spark.functions.text import with_pii_scrubbed

        df = spark.createDataFrame([(1, "a@b.io")], "doc_id BIGINT, text STRING")
        plan = (
            with_pii_scrubbed(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

"""Property tests for the round-6 operators: BPE training vs an
independent reference on random word multisets, span coverage vs an
O(n^2) brute force on random corpora, sqlite round trips on
adversarial strings."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators import bpe
from ai_fabric_etl_spark.operators.dedup import duplicate_span_coverage
from tests.test_bpe import _reference_bpe

_WORD = st.text(alphabet="abcde", min_size=1, max_size=5)


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(counts=st.dictionaries(_WORD, st.integers(1, 9),
                              min_size=1, max_size=12),
       merges=st.integers(1, 12))
def test_bpe_train_property(spark, counts, merges):
    text = " ".join(w for w, n in sorted(counts.items()) for _ in range(n))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    assert bpe.bpe_train(docs, merges) == _reference_bpe(counts, merges)


def _brute_coverage(texts: dict[int, str], k: int):
    grams: dict[str, set[int]] = {}
    pos: dict[int, list[tuple[int, str]]] = {}
    for d, t in texts.items():
        toks = t.split()
        pos[d] = []
        for i in range(len(toks) - k + 1):
            g = " ".join(toks[i:i + k])
            grams.setdefault(g, set()).add(d)
            pos[d].append((i, g))
    out = {}
    for d, t in texts.items():
        toks = t.split()
        covered = set()
        ndup = 0
        for i, g in pos[d]:
            if len(grams[g]) > 1:
                ndup += 1
                covered.update(range(i, i + k))
        out[d] = (len(toks), ndup, len(covered),
                  round(len(covered) / len(toks), 6) if toks else 0.0)
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=12)
        .map(" ".join),
        min_size=2, max_size=6,
    ),
    k=st.integers(2, 4),
)
def test_span_coverage_matches_bruteforce(spark, texts, k):
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.dup_grams, r.covered_tokens,
                   r.dup_coverage)
        for r in duplicate_span_coverage(docs, k=k).collect()
    }
    assert got == _brute_coverage(dict(rows), k)


@pytest.mark.parametrize("s", [
    "line\nbreaks\nand\ttabs",
    "quo'tes \"double\" `back`",
    "semi;colons -- comments /* block */",
    "unicode: 漢字 émojis 🎉 ütf",
    "percent % underscore _ like-wildcards",
    "",
])
def test_sqlite_adversarial_strings_roundtrip(spark, tmp_path, s):
    from ai_fabric_etl_spark.sources import sqlite_datasource as sq

    sq.register(spark)
    db = str(tmp_path / "adv.db")
    df = spark.createDataFrame([(1, s)], "k long, s string")
    df.write.format("sqlite").option("dbpath", db).option(
        "dbtable", "adv"
    ).mode("overwrite").save()
    back = (
        spark.read.format("sqlite").option("dbpath", db)
        .option("dbtable", "adv").load()
    )
    assert [r.s for r in back.collect()] == [s]
    # pushed equality filter on the adversarial value still matches
    assert back.filter(F.col("s") == s).count() == 1

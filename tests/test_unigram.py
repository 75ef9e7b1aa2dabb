"""Unigram-LM tokenizer (operators/unigram.py): forward-backward
correctness vs brute-force segmentation enumeration, Viterbi
optimality, round-trip fidelity, vocab-size convergence."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators import unigram


def _all_segmentations(word, pieces):
    """Every way to split word into pieces from the inventory."""
    n = len(word)
    outs = []

    def rec(i, acc):
        if i == n:
            outs.append(list(acc))
            return
        for j in range(i + 1, n + 1):
            if word[i:j] in pieces:
                acc.append(word[i:j])
                rec(j, acc)
                acc.pop()

    rec(0, [])
    return outs


def test_forward_backward_matches_enumeration():
    logp = {p: math.log(v) for p, v in
            {"a": 0.3, "b": 0.2, "ab": 0.25, "ba": 0.15, "aba": 0.1}.items()}
    word = "abab"
    z, exp = unigram._forward_backward(word, logp, 3)
    segs = _all_segmentations(word, set(logp))
    probs = [math.exp(sum(logp[p] for p in s)) for s in segs]
    total = sum(probs)
    assert z == pytest.approx(math.log(total), rel=1e-9)
    want = {}
    for s, pr in zip(segs, probs):
        for p in s:
            want[p] = want.get(p, 0.0) + pr / total
    for p, v in want.items():
        assert exp.get(p, 0.0) == pytest.approx(v, rel=1e-9), p


def test_viterbi_is_argmax_over_enumeration():
    logp = {p: math.log(v) for p, v in
            {"h": 0.1, "e": 0.1, "l": 0.1, "o": 0.1, "he": 0.2,
             "ll": 0.25, "hello": 0.05, "lo": 0.1}.items()}
    for word in ("hello", "hell", "ohe"):
        got = unigram.viterbi_segment(word, logp)
        segs = _all_segmentations(word, set(logp))
        best = max(segs, key=lambda s: sum(logp[p] for p in s))
        assert sum(logp[p] for p in got) == pytest.approx(
            sum(logp[p] for p in best), rel=1e-12
        ), word


def test_train_convergence_and_structure(spark):
    text = " ".join(["walking walked walker talking talked"] * 5)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    model = unigram.unigram_train(docs, vocab_size=24, seed_size=64)
    assert model and len(model) <= 24
    # all single characters of the corpus survive pruning
    chars = set("".join("walking walked walker talking talked".split()))
    assert chars <= {p for p in model if len(p) == 1}
    # probabilities normalize
    assert sum(math.exp(v) for v in model.values()) == pytest.approx(1.0, rel=1e-6)
    # shared morphemes should beat random substrings into the vocab
    multi = {p for p in model if len(p) > 1}
    assert any(m in multi for m in ("alk", "walk", "talk", "ing", "ed", "lk"))


def test_encode_decode_roundtrip(spark):
    docs = spark.createDataFrame(
        [
            (1, "walking walked walker"),
            (2, "  talking\ttalked  "),
            (3, "zzz unseen chars 漢字"),   # outside the inventory
        ],
        "doc_id long, text string",
    )
    model = unigram.unigram_train(docs, vocab_size=40, seed_size=128)
    enc = unigram.unigram_encode(docs, model)
    out = enc.select(
        "doc_id",
        unigram.unigram_decode(F.col("pieces")).alias("back"),
        F.concat_ws(" ", F.split(F.trim(F.col("text")), r"\s+")).alias("norm"),
    ).collect()
    for r in out:
        assert r.back == r.norm, r.doc_id


def test_roundtrip_with_literal_marker_strings(spark):
    """ADVICE r6 parity with bpe: documents containing the literal
    '</w>' string or the marker/escape codepoints round-trip exactly
    (byte-stuffed before tokenization, restored after decode)."""
    from ai_fabric_etl_spark.operators import bpe

    docs = spark.createDataFrame(
        [
            (1, "doc with </w> literal </w>marker"),
            (2, f"pua{bpe.EOW}char and{bpe._ESC}escape inside"),
            (3, "plain control words"),
        ],
        "doc_id long, text string",
    )
    model = unigram.unigram_train(docs, vocab_size=60, seed_size=128)
    out = (
        unigram.unigram_encode(docs, model)
        .select(
            "doc_id",
            unigram.unigram_decode(F.col("pieces")).alias("back"),
            F.concat_ws(
                " ", F.split(F.trim(F.col("text")), r"\s+")
            ).alias("norm"),
        )
        .collect()
    )
    for r in out:
        assert r.back == r.norm, r.doc_id

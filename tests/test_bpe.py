"""BPE tokenizer training/encoding (operators/bpe.py): merge-order
parity with an independent from-scratch reference, round-trip
fidelity, deterministic truncation, early stop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators import bpe


def _reference_bpe(word_counts: dict[str, int], num_merges: int,
                   min_pair_count: int = 2):
    """Independent oracle: textbook implementation recomputing pair
    stats from scratch each iteration over symbol LISTS (the module
    uses tuple-keyed dicts + incremental rebuild — different code
    path, same algorithm)."""
    corpus = [
        (list(w) + [bpe.EOW], n) for w, n in sorted(word_counts.items())
    ]
    merges = []
    for _ in range(num_merges):
        stats: dict[tuple[str, str], int] = {}
        for syms, n in corpus:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + n
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if stats[best] < min_pair_count:
            break
        merges.append(best)
        new_corpus = []
        for syms, n in corpus:
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and (syms[i], syms[i + 1]) == best):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_corpus.append((out, n))
        corpus = new_corpus
    return merges


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _docs_from_counts(spark, counts):
    text = " ".join(
        w for w, n in sorted(counts.items()) for _ in range(n)
    )
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_train_matches_independent_reference(spark):
    docs = _docs_from_counts(spark, SENNRICH)
    got = bpe.bpe_train(docs, num_merges=10, min_pair_count=2)
    want = _reference_bpe(SENNRICH, 10)
    assert got == want
    # the canonical example's first merge is ('e','s') (count 9)
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t")


def test_word_counts_and_truncation(spark):
    docs = _docs_from_counts(spark, SENNRICH)
    wc = {r.word: r.n for r in bpe.word_counts(docs).collect()}
    assert wc == SENNRICH
    top2 = {r.word for r in bpe.word_counts(docs, max_words=2).collect()}
    assert top2 == {"newest", "low"}  # count desc, word tie-break


def test_encode_matches_training_fold(spark):
    """Greedy lowest-rank encoding of a training word must equal the
    symbols that word reached during training (the standard BPE
    equivalence the GPT-2 encoder relies on)."""
    docs = _docs_from_counts(spark, SENNRICH)
    merges = bpe.bpe_train(docs, num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    # fold the training forward independently
    vocab = {w: list(w) + [bpe.EOW] for w in SENNRICH}
    for a, b in merges:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    for w, syms in vocab.items():
        assert bpe._encode_word(w, ranks) == syms, w


def test_encode_decode_roundtrip(spark):
    docs = spark.createDataFrame(
        [
            (1, "low lower newest"),
            (2, "  widest\tlow\n\nnewest  "),   # messy whitespace
            (3, "únïcødé wörds 漢字 test"),      # non-ascii
            (4, "unseen vocabulary entirely"),  # no trained merges apply
        ],
        "doc_id long, text string",
    )
    merges = bpe.bpe_train(docs, num_merges=8)
    enc = bpe.bpe_encode(docs, merges)
    out = enc.select(
        "doc_id",
        bpe.bpe_decode(F.col("pieces")).alias("back"),
        F.concat_ws(" ", F.split(F.trim(F.col("text")), r"\s+")).alias("norm"),
        F.size("pieces").alias("n_pieces"),
    ).collect()
    for r in out:
        assert r.back == r.norm, r.doc_id
    # compression: trained merges shorten the training docs below
    # character count
    n = {r.doc_id: r.n_pieces for r in out}
    assert n[1] < len("low lower newest".replace(" ", "")) + 3


def test_roundtrip_with_literal_marker_strings(spark):
    """ADVICE r6: a document containing the LITERAL marker text must
    still round-trip. The old marker was the string '</w>', which
    decode turned into a space; the PUA-codepoint marker plus
    byte-stuffing (escape_text/unescape_col) survives source text
    containing '</w>', the marker codepoint itself, AND the escape
    codepoint."""
    adversarial = [
        (1, "html </w> tag soup </w></w>"),
        (2, f"embedded{bpe.EOW}marker and{bpe._ESC}escape"),
        (3, f"{bpe._ESC}{bpe.EOW} {bpe._ESC}1 {bpe._ESC}2 edge pairs"),
        (4, "plain control document"),
    ]
    docs = spark.createDataFrame(adversarial, "doc_id long, text string")
    merges = bpe.bpe_train(docs, num_merges=6, min_pair_count=1)
    out = (
        bpe.bpe_encode(docs, merges)
        .select(
            "doc_id",
            bpe.bpe_decode(F.col("pieces")).alias("back"),
            F.concat_ws(
                " ", F.split(F.trim(F.col("text")), r"\s+")
            ).alias("norm"),
        )
        .collect()
    )
    for r in out:
        assert r.back == r.norm, r.doc_id


def test_escape_roundtrip_property():
    """escape_text is injective and unescaping inverts it, including
    ambiguity-bait sequences (escape char followed by literal '1'/'2')."""
    cases = [
        "",
        "plain",
        bpe.EOW,
        bpe._ESC,
        bpe._ESC + "1",
        bpe._ESC + "2",
        bpe._ESC + bpe._ESC + "2",
        bpe.EOW + bpe._ESC + bpe.EOW,
        "a" + bpe.EOW + "b" + bpe._ESC + "c",
    ]
    seen = {}
    for c in cases:
        e = bpe.escape_text(c)
        assert bpe.EOW not in e  # marker never appears in escaped text
        assert e not in seen, (c, seen[e])
        seen[e] = c
        # python-side inverse of the SQL unescape chain
        back = e.replace(bpe._ESC + "2", bpe.EOW).replace(
            bpe._ESC + "1", bpe._ESC
        )
        assert back == c


def test_early_stop_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, "abcdefg")], "doc_id long, text string"
    )
    # every adjacent pair occurs exactly once -> min_pair_count=2
    # stops before any merge
    assert bpe.bpe_train(docs, num_merges=50) == []
    with pytest.raises(ValueError):
        bpe.bpe_train(docs, num_merges=0)


def test_vocab_listing():
    assert bpe.bpe_vocab([("e", "s"), ("es", "t")]) == ["es", "est"]


def test_escape_roundtrip_hypothesis():
    """Property fuzz: escape/unescape invert for arbitrary text over
    an alphabet dense in marker/escape codepoints and their suffix
    digits."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from([bpe.EOW, bpe._ESC, "1", "2", "a", " "])

    @settings(max_examples=300, deadline=None)
    @given(st.lists(alphabet, max_size=30).map("".join))
    def check(s):
        e = bpe.escape_text(s)
        assert bpe.EOW not in e
        back = e.replace(bpe._ESC + "2", bpe.EOW).replace(
            bpe._ESC + "1", bpe._ESC
        )
        assert back == s

    check()

"""WordPiece tokenizer: likelihood merge criterion, MaxMatch encode,
lossless round trip (operators/wordpiece.py)."""

from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators import wordpiece as wp


def _train(spark, rows, num_merges, **kw):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )
    return docs, wp.wordpiece_train(docs, num_merges=num_merges, **kw)


def test_likelihood_criterion_beats_raw_frequency(spark):
    """Corpus engineered so the most FREQUENT pair is not the highest-
    LIKELIHOOD pair: (a,##b) appears 8x but count(a) is diluted to 14
    by standalone 'a' words; (x,##y) appears only 3x but x/##y appear
    ONLY together. BPE would merge (a,##b) first; WordPiece must merge
    (x,##y) first: 3/(3*3) = 0.333 > 8/(14*8) = 0.071."""
    rows = (
        ["ab"] * 8          # pairs (a,##b) x8
        + ["xy"] * 3        # pairs (x,##y) x3
        + ["a"] * 6         # dilute count(a) -> 14
        + ["b"] * 3         # standalone b (separate symbol from ##b)
    )
    docs, pieces = _train(spark, [" ".join(rows)], num_merges=1)
    # the merged xy is word-initial ('xy' as a whole word)
    assert "xy" in pieces
    # (a,##b) not merged in round 1: '##b' still a lone continuation
    assert wp.CONT + "b" in pieces
    assert "ab" not in pieces


def test_merge_tiebreaks_are_deterministic(spark):
    """Equal likelihood scores fall back to (pair count desc, lex)."""
    # two disjoint pairs with identical counts and identical symbol
    # counts: score ties exactly; 'cd' < 'xy' lexicographically
    rows = ["cd"] * 3 + ["xy"] * 3
    _, pieces = _train(spark, [" ".join(rows)], num_merges=1)
    assert "cd" in pieces and "xy" not in pieces


def test_maxmatch_prefers_longest_prefix():
    vocab = {"un", "unhappy", wp.CONT + "happy", wp.CONT + "py",
             "h", wp.CONT + "a"}
    # longest-match takes the whole word in one piece
    assert wp._encode_word("unhappy", vocab) == ["unhappy"]
    # remove the full word: 'un' + '##happy'
    vocab2 = vocab - {"unhappy"}
    assert wp._encode_word("unhappy", vocab2) == ["un", wp.CONT + "happy"]
    # OOV characters emit as single-char pieces (lossless deviation)
    assert wp._encode_word("zq", set()) == ["z", wp.CONT + "q"]


def test_roundtrip_exact_and_adversarial(spark):
    """decode(encode(x)) == whitespace-normalized x, including source
    text containing the literal marker/escape codepoints and '##'."""
    rows = [
        "the quick brown fox   jumps over\tthe lazy dog",
        "unhappiness unhappily unhappy happy",
        f"marker {wp.CONT} and escape {wp._ESC} and {wp._ESC}2 inline",
        "bert style ## continuation ##tokens",
        "",
        "single",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )
    pieces = wp.wordpiece_train(docs, num_merges=20, min_pair_count=1)
    enc = wp.wordpiece_encode(docs, pieces)
    norm = F.concat_ws(" ", F.split(F.trim(F.col("text")), r"\s+"))
    bad = enc.select(
        "doc_id",
        (wp.wordpiece_decode(F.col("pieces")) == norm).alias("ok"),
    ).where(~F.col("ok"))
    assert bad.count() == 0


def test_vocab_pieces_reduce_piece_count(spark):
    """More merges => no word encodes into MORE pieces, and frequent
    words collapse to fewer."""
    text = " ".join(["training"] * 10 + ["data"] * 10 + ["xyz"])
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    v0 = wp.wordpiece_train(docs, num_merges=0)
    v8 = wp.wordpiece_train(docs, num_merges=8, min_pair_count=1)
    e0 = wp.wordpiece_encode(docs, v0).select(
        F.size("pieces").alias("n")
    ).collect()[0]["n"]
    e8 = wp.wordpiece_encode(docs, v8).select(
        F.size("pieces").alias("n")
    ).collect()[0]["n"]
    assert e8 < e0

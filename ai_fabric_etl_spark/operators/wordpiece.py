"""Distributed WordPiece tokenizer training + encoding (Schuster &
Nakajima, "Japanese and Korean Voice Search", ICASSP 2012; the BERT
tokenizer — Devlin et al. 2019 — and HuggingFace `tokenizers`'
WordPiece trainer follow the same recipe). With BPE (operators/bpe.py)
and Unigram-LM (operators/unigram.py) this completes the three
mainstream subword-tokenizer families a training-data pipeline meets.

WordPiece differs from BPE in exactly two places, both implemented
here:

1. **Merge criterion is LIKELIHOOD, not frequency**: the pair (a, b)
   maximizing ``count(ab) / (count(a) * count(b))`` merges first (the
   pair whose merge most increases a unigram LM's corpus likelihood),
   where count(x) is the occurrence count of symbol x in the current
   segmentation. Scores compare as exact integer cross-products
   (``c_ab1 * c_a2 * c_b2  vs  c_ab2 * c_a1 * c_b1``) so training has
   no float ties; remaining ties break (pair count desc, pair lex).
2. **Encoding is greedy longest-match-first** (BERT's
   WordpieceTokenizer MaxMatch loop), not merge-rank replay:
   word-initial pieces match bare, word-internal pieces carry the
   continuation marker (BERT's ``##``).

Scale design mirrors BPE's: the ONLY corpus-scale work is one
word-frequency aggregation (explode → groupBy → optional top-N rank
cut); the merge loop runs over the bounded word dict on the driver;
encoding is an Arrow-batched pandas UDF with a per-batch distinct-word
memo; decode is pure codegen.

Deviation from BERT, documented: an out-of-vocabulary CHARACTER
encodes as itself (a single-char piece) instead of collapsing the
word to ``[UNK]`` — the round-trip contract
(``decode(encode(text)) == whitespace-normalized text``) is what the
driver value-verifies, and an UNK sink would destroy it. A caller
wanting BERT's behavior filters pieces absent from the vocab.

The continuation marker is a private-use codepoint (never the literal
``##``, which source text may contain) with byte-stuffed escaping, the
repo's tokenizer-marker discipline (ADVICE r6 / bpe.escape_text).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CONT = ""  # continuation marker (BERT's "##"), private-use
_ESC = ""  # escape prefix (distinct from bpe's )


def escape_text(t: str) -> str:
    """Byte-stuff CONT/_ESC occurrences so source text containing the
    marker codepoints survives tokenize→decode. Every _ESC in escaped
    text is followed by '1' (literal _ESC) or '2' (literal CONT)."""
    return t.replace(_ESC, _ESC + "1").replace(CONT, _ESC + "2")


def escape_col(col: Column) -> Column:
    return F.replace(
        F.replace(col, F.lit(_ESC), F.lit(_ESC + "1")),
        F.lit(CONT),
        F.lit(_ESC + "2"),
    )


def unescape_col(col: Column) -> Column:
    return F.replace(
        F.replace(col, F.lit(_ESC + "2"), F.lit(CONT)),
        F.lit(_ESC + "1"),
        F.lit(_ESC),
    )


def word_counts(
    docs: DataFrame, text_col: str = "text", max_words: int | None = None
) -> DataFrame:
    """``(word, n)`` frequency table — the only corpus-scale pass.
    Top-``max_words`` kept by (count desc, word), the deterministic
    rank cut via the distributed global row number (never a one-task
    window)."""
    wc = (
        docs.select(
            F.explode(
                F.split(F.trim(escape_col(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if max_words is not None:
        from ai_fabric_etl_spark.operators.ranking import global_row_number

        wc = (
            global_row_number(
                wc, [F.col("n").desc(), F.col("word")], out_col="_r"
            )
            .where(F.col("_r") <= max_words)
            .drop("_r")
        )
    return wc


def _word_symbols(word: str) -> tuple[str, ...]:
    """Initial segmentation: first char bare, the rest CONT-marked."""
    return tuple(
        c if i == 0 else CONT + c for i, c in enumerate(word)
    )


def _strip_cont(sym: str) -> str:
    return sym[len(CONT):] if sym.startswith(CONT) else sym


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + _strip_cont(b))
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def wordpiece_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_words: int | None = None,
    min_pair_count: int = 2,
) -> list[str]:
    """Learn a WordPiece vocabulary: ``num_merges`` likelihood-ranked
    merges over the word-frequency table. Returns the piece inventory
    (every symbol present in the final segmentation of the word dict,
    sorted) — word-internal pieces carry the CONT marker.

    The driver loop is O(merges × vocab symbols) over the bounded
    word dict — corpus-size-independent, the BPE/PQ-codebook
    precedent."""
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    rows = word_counts(docs, text_col, max_words).collect()
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        syms = _word_symbols(r["word"])
        vocab[syms] = vocab.get(syms, 0) + int(r["n"])
    for _ in range(num_merges):
        sym_counts: dict[str, int] = {}
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + n
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        best: tuple[str, str] | None = None
        for pair, c_ab in pair_counts.items():
            if c_ab < min_pair_count:
                continue
            if best is None:
                best = pair
                continue
            b_ab = pair_counts[best]
            # score(pair) > score(best) as exact integer cross-product:
            # c_ab/(c_a*c_b) > b_ab/(b_a*b_b)
            lhs = c_ab * sym_counts[best[0]] * sym_counts[best[1]]
            rhs = b_ab * sym_counts[pair[0]] * sym_counts[pair[1]]
            if lhs > rhs or (
                lhs == rhs and (-c_ab, pair) < (-b_ab, best)
            ):
                best = pair
        if best is None:
            break
        vocab = {_merge_word(s, best): n for s, n in vocab.items()}
    pieces: set[str] = set()
    for syms in vocab:
        pieces.update(syms)
    return sorted(pieces)


def _encode_word(word: str, vocab: set[str]) -> list[str]:
    """BERT MaxMatch: repeatedly take the LONGEST prefix that is in
    the vocab (continuation-marked after the first piece); an
    unmatched character emits as a single-char piece (lossless OOV
    deviation, see module docstring)."""
    out: list[str] = []
    i = 0
    while i < len(word):
        prefix = "" if i == 0 else CONT
        j = len(word)
        piece = None
        while j > i:
            cand = prefix + word[i:j]
            if cand in vocab:
                piece = cand
                break
            j -= 1
        if piece is None:
            piece = prefix + word[i]
            j = i + 1
        out.append(piece)
        i = j
    return out


def wordpiece_encode(
    docs: DataFrame,
    pieces: list[str],
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """Append ``out_col: array<string>`` of WordPiece pieces
    (word-internal pieces CONT-marked). Arrow-batched; distinct words
    memoized per batch."""
    vocab = set(pieces)

    @F.pandas_udf("array<array<string>>")
    def _enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc_text(t):
            if t is None:
                return None
            out: list[list[str]] = []
            for w in escape_text(t).strip().split():
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w, vocab)
                    memo[w] = got
                out.append(got)
            return out

        return pd.Series([enc_text(t) for t in texts])

    return docs.withColumn(out_col, F.flatten(_enc(F.col(text_col))))


def wordpiece_decode(pieces: Column) -> Column:
    """Inverse of :func:`wordpiece_encode`, pure codegen: a piece
    starting with CONT glues to the previous piece, any other piece
    starts a new space-separated word; escaped literal CONT/_ESC
    source characters restore last. Yields the whitespace-NORMALIZED
    source text."""
    joined = F.concat_ws(
        "",
        F.transform(
            pieces,
            lambda p: F.when(
                p.startswith(CONT), F.substring(p, 2, 2147483647)
            ).otherwise(F.concat(F.lit(" "), p)),
        ),
    )
    return F.trim(unescape_col(joined))

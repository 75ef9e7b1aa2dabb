"""Distributed BPE tokenizer training + encoding (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016 — the byte-pair-encoding recipe every modern LM tokenizer
descends from).

The reference has nothing like this; it belongs to the brief's
training-data-pipeline surface: after curation/dedup/packing, the
corpus needs a tokenizer, and training one IS a corpus-scale
aggregation problem.

Scale design — the published algorithm splits cleanly into a corpus
pass and a vocab loop:

1. **Corpus pass (the 100 TB part):** BPE statistics depend only on
   the WORD-FREQUENCY table (Sennrich's own formulation operates on a
   word->count dict), so the single full-data operation is
   ``explode(split()) -> groupBy(word).count()`` — one shuffle, fully
   parallel, optionally truncated to the top-``max_words`` words by
   count (rank, not hash-order, so truncation is deterministic).
2. **Merge loop (bounded):** the distinct-word table is orders of
   magnitude smaller than the corpus (Heaps' law; ~millions of rows
   for web-scale text) and collapses to the driver the same way the
   PQ/IVF codebooks do (operators/similarity.py) — an explicitly
   bounded driver literal, not a corpus collect. The loop itself is
   the textbook algorithm: repeatedly merge the most frequent
   adjacent symbol pair, ties broken deterministically
   (count desc, then lexicographic pair), so training is
   reproducible across runs/partitionings by construction.
3. **Encode (corpus-scale again):** merges ship to executors as a
   plain broadcast list; an Arrow-batched pandas UDF applies them in
   rank order (the GPT-2-style greedy lowest-rank loop) with a
   per-batch word memo — each DISTINCT word is encoded once per
   batch, so boilerplate-heavy batches cost vocabulary, not volume.
4. **Decode** is pure codegen: concat pieces, drop the end-of-word
   marker — giving the exact whitespace-normalized source back, which
   is the round-trip contract ``text_bpe_roundtrip`` verifies
   value-by-value against DuckDB.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# End-of-word marker. Sennrich's paper uses the literal "</w>", but a
# source document may CONTAIN that string, and decode would then turn
# it into a space (ADVICE r6: roundtrip_ok flips false on such
# corpora). A single private-use codepoint plus byte-stuffing makes
# the marker truly non-collidable: source occurrences of EOW/_ESC are
# escaped before tokenization and restored after decode, so the
# marker in a piece stream ALWAYS means end-of-word.
EOW = "\ue000"  # end-of-word marker (private-use codepoint)
_ESC = "\ue001"  # escape prefix


def escape_text(t: str) -> str:
    """Byte-stuff EOW/_ESC occurrences in source text so they survive
    tokenize->decode. Every _ESC in escaped text is followed by '1'
    (a literal _ESC) or '2' (a literal EOW); the pairs cannot overlap
    (_ESC differs from both suffixes), so the global replaces in
    :func:`unescape_col` are unambiguous."""
    return t.replace(_ESC, _ESC + "1").replace(EOW, _ESC + "2")


def escape_col(col: Column) -> Column:
    """SQL-side :func:`escape_text` (codegen, for the corpus pass)."""
    return F.replace(
        F.replace(col, F.lit(_ESC), F.lit(_ESC + "1")),
        F.lit(EOW),
        F.lit(_ESC + "2"),
    )


def unescape_col(col: Column) -> Column:
    """SQL-side inverse of :func:`escape_text` (applied after the
    marker->space replace in decode)."""
    return F.replace(
        F.replace(col, F.lit(_ESC + "2"), F.lit(EOW)),
        F.lit(_ESC + "1"),
        F.lit(_ESC),
    )


def word_counts(
    docs: DataFrame, text_col: str = "text", max_words: int | None = None
) -> DataFrame:
    """``(word, n)`` frequency table — the only corpus-scale pass of
    BPE training. ``max_words`` keeps the top-N by (count desc, word)
    — a deterministic truncation for adversarially huge vocabularies."""
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
        # rank-based cut via the DISTRIBUTED global row number (the
        # vocabulary grain reaches hundreds of millions of rows at
        # corpus scale — never a one-task window); (count, word) is a
        # total order, so the boundary is stable
        from ai_fabric_etl_spark.operators.ranking import global_row_number

        wc = (
            global_row_number(
                wc, [F.col("n").desc(), F.col("word")], out_col="_r"
            )
            .where(F.col("_r") <= max_words)
            .drop("_r")
        )
    return wc


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    stats: dict[tuple[str, str], int] = {}
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + n
    return stats


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_words: int | None = None,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list ``[(left, right), ...]`` (rank = position).

    Stops early when no pair reaches ``min_pair_count`` (merging a
    pair seen once generalizes nothing). The driver loop recomputes
    pair statistics per merge over the word dict — O(merges x vocab
    symbols), all in memory, independent of corpus size."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    rows = word_counts(docs, text_col, max_words).collect()
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        syms = tuple(r["word"]) + (EOW,)
        vocab[syms] = vocab.get(syms, 0) + int(r["n"])
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        # deterministic argmax: count desc, then lexicographic pair
        pair = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if stats[pair] < min_pair_count:
            break
        merges.append(pair)
        vocab = {_merge_word(s, pair): n for s, n in vocab.items()}
    return merges


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The learned subword inventory: every merge product, in rank
    order (base characters are implicit — any unseen character still
    encodes as itself)."""
    return [a + b for a, b in merges]


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style greedy loop: repeatedly apply the LOWEST-rank merge
    present in the word until none applies."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """Append ``out_col: array<string>`` of BPE pieces (whitespace
    words expanded to subwords, each word ending in a piece that
    carries ``</w>``). Arrow-batched; distinct words memoized per
    batch."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf("array<array<string>>")
    def _enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc_text(t):
            if t is None:
                return None
            out: list[list[str]] = []
            # same escaping as word_counts, so encode symbols match
            # the trained merge alphabet
            for w in escape_text(t).strip().split():
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    memo[w] = got
                out.append(got)
            return out

        return pd.Series([enc_text(t) for t in texts])

    return docs.withColumn(out_col, F.flatten(_enc(F.col(text_col))))


def bpe_decode(pieces: Column) -> Column:
    """Inverse of :func:`bpe_encode`, pure codegen: concatenate the
    pieces, turn each end-of-word marker back into a single space,
    and restore escaped literal EOW/_ESC source characters — yields
    the whitespace-NORMALIZED source text (tokenization is
    ``split(\\s+)``, so runs of whitespace are one space back)."""
    return F.trim(
        unescape_col(
            F.replace(F.concat_ws("", pieces), F.lit(EOW), F.lit(" "))
        )
    )

"""Unigram-LM subword tokenizer (Kudo, "Subword Regularization", ACL
2018 — the SentencePiece ``model_type=unigram`` algorithm behind
Llama/T5 tokenizers), distributed the same way as BPE
(operators/bpe.py):

1. **Corpus pass:** the only full-data operation is the word-frequency
   aggregation (``bpe.word_counts`` — one explode + groupBy shuffle,
   optionally top-N truncated).
2. **Driver loop (bounded):** seed the piece inventory with the
   corpus's frequent substrings, then alternate EM rounds (expected
   piece counts via forward–backward over each word's segmentation
   lattice) with pruning rounds (drop the lowest-probability
   non-single-char pieces) until the target vocab size — the textbook
   algorithm, run over the word dict exactly like SentencePiece runs
   it over its in-memory suffix-array corpus. Deterministic: iteration
   order is sorted, ties break lexicographically.
3. **Encode:** Viterbi best segmentation per word under the final
   piece log-probs, applied as an Arrow-batched pandas UDF with a
   per-batch distinct-word memo; any character outside the inventory
   segments as itself (single chars are never pruned, so every word
   always has at least one segmentation).
4. **Decode:** pure codegen — pieces concatenate back to the exact
   whitespace-normalized source (the ``text_unigram_roundtrip``
   contract).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators.bpe import (
    EOW,
    escape_text,
    unescape_col,
    word_counts,
)

_SEED_MAX_PIECE_LEN = 6


def _collect_word_counts(
    docs: DataFrame, text_col: str, max_words: int | None
) -> dict[str, int]:
    rows = word_counts(docs, text_col, max_words).collect()
    out: dict[str, int] = {}
    for r in rows:
        out[r["word"]] = out.get(r["word"], 0) + int(r["n"])
    return out


def _seed_pieces(
    wc: dict[str, int], seed_size: int, max_len: int = _SEED_MAX_PIECE_LEN
) -> dict[str, float]:
    """Frequent-substring seed inventory: every substring up to
    ``max_len`` weighted by its word's count; all single characters
    always included. Kept to the top ``seed_size`` by (count desc,
    piece) — the deterministic analogue of SentencePiece's
    suffix-array seed."""
    freq: dict[str, int] = {}
    for w, n in sorted(wc.items()):
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                p = w[i:j]
                freq[p] = freq.get(p, 0) + n
    chars = {p for p in freq if len(p) == 1}
    multi = sorted(
        (p for p in freq if len(p) > 1),
        key=lambda p: (-freq[p], p),
    )[: max(0, seed_size - len(chars))]
    seed = {p: float(freq[p]) for p in chars}
    seed.update({p: float(freq[p]) for p in multi})
    total = sum(seed.values())
    return {p: v / total for p, v in seed.items()}


def _forward_backward(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[float, dict[str, float]]:
    """(log-likelihood, expected piece counts) of one word under the
    current model — the lattice forward–backward."""
    n = len(word)
    NEG = float("-inf")
    fwd = [NEG] * (n + 1)
    fwd[0] = 0.0
    for j in range(1, n + 1):
        acc = NEG
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is None or fwd[i] == NEG:
                continue
            v = fwd[i] + lp
            acc = v if acc == NEG else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        fwd[j] = acc
    if fwd[n] == NEG:
        return NEG, {}
    bwd = [NEG] * (n + 1)
    bwd[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = NEG
        for j in range(i + 1, min(n, i + max_len) + 1):
            lp = logp.get(word[i:j])
            if lp is None or bwd[j] == NEG:
                continue
            v = lp + bwd[j]
            acc = v if acc == NEG else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        bwd[i] = acc
    z = fwd[n]
    exp: dict[str, float] = {}
    for i in range(n):
        if fwd[i] == NEG:
            continue
        for j in range(i + 1, min(n, i + max_len) + 1):
            p = word[i:j]
            lp = logp.get(p)
            if lp is None or bwd[j] == NEG:
                continue
            gamma = math.exp(fwd[i] + lp + bwd[j] - z)
            exp[p] = exp.get(p, 0.0) + gamma
    return z, exp


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    max_words: int | None = None,
    seed_size: int = 4096,
    em_rounds: int = 2,
    shrink: float = 0.75,
) -> dict[str, float]:
    """Learn the unigram piece inventory; returns {piece: log-prob}.

    Alternates ``em_rounds`` of EM with pruning to ``shrink`` of the
    current inventory (single characters are never pruned) until
    ``vocab_size`` is reached, then runs a final EM. O(words x
    len^2 x rounds) driver work over the bounded word dict —
    independent of corpus size, exactly like the BPE merge loop and
    the PQ codebooks."""
    wc = _collect_word_counts(docs, text_col, max_words)
    if not wc:
        return {}
    probs = _seed_pieces(wc, seed_size)
    max_len = max(len(p) for p in probs)

    def em(probs: dict[str, float], rounds: int) -> dict[str, float]:
        for _ in range(rounds):
            logp = {p: math.log(v) for p, v in probs.items() if v > 0}
            exp: dict[str, float] = {}
            for w, n in sorted(wc.items()):
                _z, e = _forward_backward(w, logp, max_len)
                for p, c in e.items():
                    exp[p] = exp.get(p, 0.0) + n * c
            total = sum(exp.values())
            if total <= 0:
                return probs
            # characters keep a floor so every word stays segmentable
            floor = 1e-10
            probs = {
                p: max(exp.get(p, 0.0) / total, floor if len(p) == 1 else 0.0)
                for p in probs
                if len(p) == 1 or exp.get(p, 0.0) > 0
            }
        return probs

    probs = em(probs, em_rounds)
    while sum(1 for p in probs) > vocab_size:
        multi = sorted(
            (p for p in probs if len(p) > 1),
            key=lambda p: (probs[p], p),
        )
        n_chars = sum(1 for p in probs if len(p) == 1)
        keep_multi = max(
            vocab_size - n_chars,
            int(len(multi) * shrink) if len(multi) * shrink >= 1 else 0,
        )
        if keep_multi >= len(multi):
            break
        dropped = set(multi[: len(multi) - keep_multi])
        probs = {p: v for p, v in probs.items() if p not in dropped}
        probs = em(probs, 1)
    probs = em(probs, 1)
    total = sum(probs.values())
    return {
        p: math.log(v / total) for p, v in sorted(probs.items()) if v > 0
    }


def viterbi_segment(word: str, logp: dict[str, float],
                    max_len: int | None = None) -> list[str]:
    """Best segmentation under the model; unknown characters fall back
    to themselves with a large penalty (never fails)."""
    if not word:
        return []
    if max_len is None:
        max_len = max((len(p) for p in logp), default=1)
    n = len(word)
    UNK = -100.0
    best = [float("-inf")] * (n + 1)
    back: list[tuple[int, str]] = [(0, "")] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            p = word[i:j]
            lp = logp.get(p)
            if lp is None:
                if j - i == 1:
                    lp = UNK  # unknown single char
                else:
                    continue
            v = best[i] + lp
            # strictly greater: ties prefer the EARLIER (longer-piece-
            # first) split found at smaller i — deterministic
            if v > best[j]:
                best[j] = v
                back[j] = (i, p)
    out: list[str] = []
    j = n
    while j > 0:
        i, p = back[j]
        out.append(p)
        j = i
    return list(reversed(out))


def unigram_encode(
    docs: DataFrame,
    model: dict[str, float],
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """Viterbi-encode each document's words; each word's last piece is
    suffixed with the end-of-word marker so decode is reversible."""
    max_len = max((len(p) for p in model), default=1)

    @F.pandas_udf("array<array<string>>")
    def _enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc(t):
            if t is None:
                return None
            out = []
            # same escaping as word_counts (the training corpus pass)
            for w in escape_text(t).strip().split():
                got = memo.get(w)
                if got is None:
                    pieces = viterbi_segment(w, model, max_len)
                    got = pieces[:-1] + [pieces[-1] + EOW] if pieces else []
                    memo[w] = got
                out.append(got)
            return out

        return pd.Series([enc(t) for t in texts])

    return docs.withColumn(out_col, F.flatten(_enc(F.col(text_col))))


def unigram_decode(pieces: Column) -> Column:
    """Inverse of :func:`unigram_encode` (same contract as
    bpe.bpe_decode): concatenate, end-of-word markers become spaces,
    escaped literal marker characters are restored."""
    return F.trim(
        unescape_col(
            F.replace(F.concat_ws("", pieces), F.lit(EOW), F.lit(" "))
        )
    )

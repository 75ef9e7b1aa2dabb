"""Full-text relevance search over a document corpus: BM25 scoring
and term-frequency statistics, pure DataFrame ops (no UDFs).

Brief extension beyond the reference (its only text predicates are
substring/regex filters, SURVEY §2.2 P11); a training-data pipeline
needs corpus search for targeted curation — "pull the top-k documents
about X" — without an external index.

Scale design (100 TB):
- the per-document work is explode + filter-to-query-terms: the term
  list is a broadcast literal, so the corpus side prunes to matching
  tokens BEFORE any shuffle — the only wide exchange carries
  (doc, query-term, tf) rows for documents containing at least one
  query term;
- corpus statistics (N, avgdl) are one scalar aggregate, broadcast
  back; per-term document frequencies are at most |query| rows,
  broadcast;
- top-k is orderBy+limit → TakeOrderedAndProject (per-partition
  partial top-k, never a global sort).

Scores are rounded to a fixed scale for cross-engine determinism
(the repo-wide convention for derived doubles).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(text_col) -> "F.Column":
    """Lowercase alphanumeric tokens — the same regex DuckDB's
    ``string_split_regex`` replays bit-identically."""
    return F.filter(
        F.split(F.lower(text_col), _TOKEN_SPLIT), lambda t: t != F.lit("")
    )


def normalize_query(query: str) -> list[str]:
    """Query string → deduplicated token list (same tokenizer)."""
    toks = [t for t in re.split(_TOKEN_SPLIT, query.lower()) if t]
    seen: dict[str, None] = {}
    for t in toks:
        seen.setdefault(t)
    return list(seen)


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` under BM25 (Robertson/Sparck
    Jones; the Lucene-style ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf,
    which is always positive). Returns (id, score, n_terms_matched),
    highest score first, ties broken by id.

    Every stage is JVM-side: tokenize → explode → filter to the
    broadcast query-term set → one groupBy(doc, term) for tf → join
    the ≤|query|-row df table and the scalar (N, avgdl) — both
    broadcast — → weighted sum per doc → TakeOrdered top-k.
    """
    terms = normalize_query(query)
    if not terms:
        raise ValueError("query tokenizes to no terms")

    toks = docs.select(
        F.col(id_col),
        tokenize(F.col(text_col)).alias("_toks"),
    ).select(
        id_col,
        F.size("_toks").cast("double").alias("_dl"),
        F.explode("_toks").alias("term"),
    )
    hits = toks.filter(F.col("term").isin(terms))

    # tf per (doc, term); carry the doc length through the same shuffle
    tf = hits.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.first("_dl").alias("dl"),
    )

    # corpus scalars and per-term document frequency (both tiny)
    stats = docs.select(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(tokenize(F.col(text_col)))).alias("avgdl"),
    )
    df_t = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
    )

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.round(F.sum("w"), 6).alias("score"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )
    return per_doc.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def bm25_topk_sql(
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """ANSI/DuckDB oracle replaying :func:`bm25_topk` exactly."""
    terms = normalize_query(query)
    in_list = ", ".join(f"''{t}''" for t in terms).replace("''", "'")
    return f"""
WITH toks AS (
  SELECT {id_col},
         len(list_filter(string_split_regex(lower({text_col}),
              '{_TOKEN_SPLIT}'), x -> x <> '')) AS dl,
         unnest(list_filter(string_split_regex(lower({text_col}),
              '{_TOKEN_SPLIT}'), x -> x <> '')) AS term
  FROM {table}
),
tf AS (
  SELECT {id_col}, term, CAST(COUNT(*) AS DOUBLE) AS tf,
         CAST(MIN(dl) AS DOUBLE) AS dl
  FROM toks WHERE term IN ({in_list})
  GROUP BY {id_col}, term
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         AVG(len(list_filter(string_split_regex(lower({text_col}),
              '{_TOKEN_SPLIT}'), x -> x <> ''))) AS avgdl
  FROM {table}
),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
)
SELECT tf.{id_col},
       ROUND(SUM(
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         * (tf.tf * ({k1} + 1.0))
         / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl))
       ), 6) AS score,
       COUNT(*) AS n_terms_matched
FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s
GROUP BY tf.{id_col}
ORDER BY score DESC, tf.{id_col}
LIMIT {k}
"""


def term_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """Corpus vocabulary statistics — (term, df, total_tf, idf) for
    terms appearing in at least ``min_df`` documents. One explode +
    two-level aggregate; the idf uses the same positive-ln form as
    :func:`bm25_topk`. This is the build side of any inverted-index/
    keyword-curation step."""
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    per_doc = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf_doc")
    )
    n_docs = docs.select(F.count(F.lit(1)).cast("double").alias("n_docs"))
    return (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf_doc").alias("total_tf"),
        )
        .filter(F.col("df") >= min_df)
        .join(F.broadcast(n_docs))
        .withColumn(
            "idf",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ),
                6,
            ),
        )
        .drop("n_docs")
    )


# math import kept for callers computing reference scores in tests
_ = math


def tfidf_topk_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Per-document top-``k`` keywords by tf-idf — the classic sparse
    document vector / keyword-extraction export (the retrieval-side
    twin of :func:`bm25_topk`, which scores docs for one query; this
    scores every term for every doc).

    Returns (id, term, tf, df, score, rank): tf = in-document count,
    idf = the same always-positive ln(1 + (N - df + 0.5)/(df + 0.5))
    as BM25, score = round(tf * idf, 6), rank 1..k by (score desc,
    term) — ranking on the ROUNDED score so cross-engine ulp noise
    cannot flip an ordering the oracle hashes.

    Scale plan: one explode + (doc, term) count; document frequency
    reuses that same aggregate grouped by term (exchange-reusable) and
    joins back on term — a vocabulary-sized join, NOT broadcast
    (vocabularies run to tens of millions of terms at corpus scale;
    ``min_df`` and a stopword cap bound the skewed head). The final
    ranking is a per-document window: groups are single documents, so
    no partition can exceed a document's distinct-term count — the
    mapInPandas prereduce that pays off for few-large-groups top-k
    (topk_per_group) would only add Python overhead here.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select(F.count(F.lit(1)).cast("double").alias("n_docs"))
    df_t = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    from pyspark.sql.window import Window

    scored = (
        tf.join(df_t, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def tfidf_topk_terms_sql(
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    min_df: int = 1,
) -> str:
    """ANSI/DuckDB oracle replaying :func:`tfidf_topk_terms`."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         unnest(list_filter(string_split_regex(lower({text_col}),
              '{_TOKEN_SPLIT}'), x -> x <> '')) AS term
  FROM {table}
),
tf AS (
  SELECT {id_col}, term, COUNT(*) AS tf FROM toks GROUP BY {id_col}, term
),
dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term HAVING COUNT(*) >= {min_df}
),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM {table}),
scored AS (
  SELECT tf.{id_col}, tf.term, tf.tf, d.df,
         ROUND(tf.tf * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)), 6)
           AS score
  FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s
)
SELECT {id_col}, term, tf, df, score,
       CAST(row_number() OVER (PARTITION BY {id_col}
                               ORDER BY score DESC, term) AS INT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query: str,
    query_vec_id: int,
    k: int = 10,
    k_each: int = 20,
    rrf_c: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical+semantic retrieval via reciprocal-rank fusion
    (Cormack et al., SIGIR'09): BM25 top-``k_each`` ranks and exact
    cosine top-``k_each`` ranks fuse as
    ``sum over lists of 1/(rrf_c + rank)``, a list missing the doc
    contributing 0. Returns the fused top-``k``:
    (id, rrf_score, lex_rank, sem_rank), rrf_score rounded to the
    repo's 6-dp derived-double convention, ties broken by id.

    Scale shape: the two candidate lists are each top-k reductions of
    independently-optimized plans (BM25: pruned explode + broadcast
    stats + TakeOrdered; ANN: broadcast query x corpus scan — swap in
    ivf_topk/lsh_topk for the 100 TB path, the fusion is rank-only
    and does not care how candidates were produced). The fusion
    itself joins two <= k_each-row frames — driver-scale, executed as
    a broadcast full-outer join; nothing here rescans the corpus.
    """
    from ai_fabric_etl_spark.operators.similarity import brute_force_topk

    lex = bm25_topk(docs, query, k=k_each, id_col=id_col, text_col=text_col)
    # rank within the <= k_each-row candidate list WITHOUT a global
    # window (the fleet plans window-hazard-free): rank = 1 + count of
    # strictly-better (score desc, id) rows — a broadcast theta-join
    # over a bounded frame
    a = lex.select(F.col(id_col).alias("id"), "score")
    b = lex.select(
        F.col(id_col).alias("id2"), F.col("score").alias("score2")
    )
    better = (F.col("score2") > F.col("score")) | (
        (F.col("score2") == F.col("score")) & (F.col("id2") < F.col("id"))
    )
    lex_ranked = (
        a.join(F.broadcast(b), better, "left")
        .groupBy("id")
        .agg((F.count("id2") + 1).cast("int").alias("lex_rank"))
    )
    sem = brute_force_topk(
        embeddings,
        embeddings.filter(F.col(vec_id_col) == query_vec_id),
        k=k_each,
        id_col=vec_id_col,
        vec_col=vec_col,
    )
    sem_ranked = sem.select(
        F.col("neighbor_id").alias("id"), F.col("rank").alias("sem_rank")
    )
    fused = (
        lex_ranked.join(sem_ranked, "id", "full_outer")
        .withColumn(
            "rrf_score",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(float(rrf_c)) + F.col("lex_rank")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(float(rrf_c)) + F.col("sem_rank")),
                    F.lit(0.0),
                ),
                6,
            ),
        )
        .select(
            F.col("id").alias(id_col), "rrf_score", "lex_rank", "sem_rank"
        )
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col(id_col)).limit(k)


def hybrid_rrf_topk_sql(
    query: str,
    query_vec_id: int,
    k: int = 10,
    k_each: int = 20,
    rrf_c: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    doc_table: str = "documents",
    emb_table: str = "embeddings",
) -> str:
    """ANSI/DuckDB oracle replaying :func:`hybrid_rrf_topk` exactly:
    the BM25 CTE is the bm25_topk oracle, the cosine CTE the
    emb_knn oracle shape, the fusion the same coalesced unit-fraction
    sum at 6 dp."""
    bm25 = bm25_topk_sql(
        query, k=k_each, id_col=id_col, text_col=text_col, table=doc_table
    )
    return f"""
WITH lex AS (
  SELECT {id_col} AS id,
         CAST(row_number() OVER (ORDER BY score DESC, {id_col}) AS INT)
           AS lex_rank
  FROM ({bm25})
),
qv AS (SELECT embedding AS v FROM {emb_table} WHERE vec_id = {query_vec_id}),
cos AS (
  SELECT c.vec_id AS id,
         (SELECT SUM(x * y) FROM (SELECT unnest(q.v)::DOUBLE AS x,
                                         unnest(c.embedding)::DOUBLE AS y))
         / (sqrt((SELECT SUM(x * x) FROM (SELECT unnest(q.v)::DOUBLE AS x)))
            * sqrt((SELECT SUM(y * y)
                    FROM (SELECT unnest(c.embedding)::DOUBLE AS y))))
           AS cosine_sim
  FROM {emb_table} c CROSS JOIN qv q
  WHERE c.vec_id <> {query_vec_id}
),
sem AS (
  SELECT id,
         CAST(row_number() OVER (ORDER BY cosine_sim DESC, id) AS INT)
           AS sem_rank
  FROM cos
  QUALIFY sem_rank <= {k_each}
)
SELECT COALESCE(lex.id, sem.id) AS {id_col},
       ROUND(COALESCE(1.0 / ({rrf_c} + lex_rank), 0.0)
             + COALESCE(1.0 / ({rrf_c} + sem_rank), 0.0), 6) AS rrf_score,
       lex_rank, sem_rank
FROM lex FULL OUTER JOIN sem ON lex.id = sem.id
ORDER BY rrf_score DESC, {id_col}
LIMIT {k}
"""


def mmr_rerank(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 8,
    k_cand: int = 20,
    lam: float = 0.7,
    mu: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98 — the standard diversity pass between retrieval and a
    RAG context window): from the exact-cosine top-``k_cand``
    candidates for the query vector, greedily select ``k`` results,
    each step maximizing ``lam * rel(d) - mu * max sim(d, selected)``
    (empty selected set => the similarity term is 0), ties broken by
    id. Returns (id, mmr_rank, rel_cosine, mmr_score), scores rounded
    to the repo's 6-dp derived-double convention.

    Scale shape: candidate generation is whatever top-k reduction the
    caller's corpus needs (brute force here; the IVF/LSH paths produce
    the same (id, rel) frame) — the ONLY corpus-scale stage. The
    candidate-pair similarity matrix is a broadcast self-join of a
    <=k_cand-row frame with the fixed-order cosine fold, and the
    greedy scan runs once over those <=k_cand^2 rows inside a single
    applyInPandas task: O(k * k_cand^2) comparisons on driver-free
    executor memory, constant in corpus size.

    Float discipline: rel and pairwise sims are computed by the SAME
    left-associated aggregate fold the DuckDB oracle's unnest-SUM
    replays; the greedy step only COMPARES those doubles plus one
    ``lam*rel - mu*ms`` expression evaluated in identical order, so
    selection is bit-deterministic across engines; rounding happens
    after selection, JVM-side."""
    import pandas as pd

    from ai_fabric_etl_spark.operators.similarity import (
        brute_force_topk,
        cosine,
    )

    if not 1 <= k <= k_cand:
        raise ValueError(f"need 1 <= k <= k_cand, got k={k} k_cand={k_cand}")
    cand = brute_force_topk(
        embeddings,
        embeddings.filter(F.col(id_col) == query_vec_id),
        k=k_cand,
        id_col=id_col,
        vec_col=vec_col,
    ).select(F.col("neighbor_id").alias("id"), F.col("cosine_sim").alias("rel"))
    vecs = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    ce = cand.join(vecs, "id")
    a = ce.select(
        F.col("id").alias("ia"),
        F.col("rel").alias("rel_a"),
        F.col("v").alias("va"),
    )
    b = ce.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
    # LEFT join so a singleton candidate set still seeds the greedy
    # (ia != ib yields no pairs for one candidate; an inner join then
    # produced zero groups and an empty result, while the SQL
    # oracle's sel1 CTE correctly returned that candidate at rank 1 —
    # ADVICE r9). With >= 2 candidates every row matches and the plan
    # is the old inner join.
    pairs = (
        a.join(F.broadcast(b), F.col("ia") != F.col("ib"), "left")
        .select(
            "ia",
            "rel_a",
            "ib",
            cosine(F.col("va"), F.col("vb")).alias("s"),
        )
        .withColumn("_g", F.lit(1))
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        rel: dict[int, float] = {}
        sim: dict[tuple[int, int], float] = {}
        for r in pdf.itertuples():
            rel[int(r.ia)] = float(r.rel_a)
            if not pd.isna(r.ib):
                sim[(int(r.ia), int(r.ib))] = float(r.s)
        remaining = sorted(rel)
        selected: list[int] = []
        out_id, out_rk, out_rel, out_score = [], [], [], []
        for step in range(1, min(k, len(rel)) + 1):
            best_key, best_id, best_score = None, None, None
            for i in remaining:
                ms = max([sim[(i, j)] for j in selected], default=0.0)
                score = lam * rel[i] - mu * ms
                key = (-score, i)
                if best_key is None or key < best_key:
                    best_key, best_id, best_score = key, i, score
            selected.append(best_id)
            remaining.remove(best_id)
            out_id.append(best_id)
            out_rk.append(step)
            out_rel.append(rel[best_id])
            out_score.append(best_score)
        return pd.DataFrame(
            {
                "id": out_id,
                "mmr_rank": out_rk,
                "rel_cosine": out_rel,
                "mmr_score": out_score,
            }
        )

    res = pairs.groupBy("_g").applyInPandas(
        greedy,
        schema="id long, mmr_rank int, rel_cosine double, mmr_score double",
    )
    return res.select(
        F.col("id").alias(id_col),
        "mmr_rank",
        F.round("rel_cosine", 6).alias("rel_cosine"),
        F.round("mmr_score", 6).alias("mmr_score"),
    ).orderBy("mmr_rank")


def mmr_rerank_sql(
    query_vec_id: int,
    k: int = 8,
    k_cand: int = 20,
    lam: float = 0.7,
    mu: float = 0.3,
    id_col: str = "vec_id",
    emb_table: str = "embeddings",
) -> str:
    """ANSI/DuckDB oracle replaying :func:`mmr_rerank` exactly: the
    candidate CTE is the emb_knn cosine shape, pairwise sims the same
    unnest-SUM fixed-order fold, and the greedy selection unrolls as
    ``k`` chained argmax CTEs (score DESC, id) — bit-for-bit the
    engine's comparisons."""
    lam_s, mu_s = repr(float(lam)), repr(float(mu))
    # Every CTE is MATERIALIZED: the acc chain references each
    # predecessor twice (argmax join + NOT IN) and itself chains k
    # deep, so DuckDB's default inlining re-expands the candidate
    # scan exponentially in k (measured: k=8 at sf0.001 never
    # finishes; materialized it is instant).
    dot = (
        "(SELECT SUM(x * y) FROM (SELECT unnest(a.v)::DOUBLE AS x, "
        "unnest(b.v)::DOUBLE AS y))"
    )
    na = "sqrt((SELECT SUM(x * x) FROM (SELECT unnest(a.v)::DOUBLE AS x)))"
    nb = "sqrt((SELECT SUM(y * y) FROM (SELECT unnest(b.v)::DOUBLE AS y)))"
    parts = [
        f"""WITH qv AS (SELECT embedding AS v FROM {emb_table}
        WHERE {id_col} = {query_vec_id}),
cand AS MATERIALIZED (
  SELECT c.{id_col} AS id,
         (SELECT SUM(x * y) FROM (SELECT unnest(q.v)::DOUBLE AS x,
                                         unnest(c.embedding)::DOUBLE AS y))
         / (sqrt((SELECT SUM(x * x) FROM (SELECT unnest(q.v)::DOUBLE AS x)))
            * sqrt((SELECT SUM(y * y)
                    FROM (SELECT unnest(c.embedding)::DOUBLE AS y))))
           AS rel
  FROM {emb_table} c CROSS JOIN qv q
  WHERE c.{id_col} <> {query_vec_id}
  ORDER BY rel DESC, id LIMIT {k_cand}
),
pv AS MATERIALIZED (SELECT cand.id, cand.rel, e.embedding AS v
       FROM cand JOIN {emb_table} e ON e.{id_col} = cand.id),
sims AS MATERIALIZED (
  SELECT a.id AS ia, b.id AS ib, {dot} / ({na} * {nb}) AS s
  FROM pv a JOIN pv b ON a.id <> b.id
),
sel1 AS MATERIALIZED (SELECT id, rel,
                CAST({lam_s} AS DOUBLE) * rel
                - CAST({mu_s} AS DOUBLE) * CAST(0 AS DOUBLE) AS score,
                1 AS rk
         FROM cand ORDER BY score DESC, id LIMIT 1),
acc1 AS MATERIALIZED (SELECT * FROM sel1)"""
    ]
    for t in range(2, k + 1):
        parts.append(
            f""",
sel{t} AS MATERIALIZED (
  SELECT c.id, c.rel,
         CAST({lam_s} AS DOUBLE) * c.rel
         - CAST({mu_s} AS DOUBLE) * ms.m AS score,
         {t} AS rk
  FROM cand c
  JOIN (SELECT s.ia AS id, MAX(s.s) AS m
        FROM sims s JOIN acc{t - 1} p ON s.ib = p.id
        GROUP BY s.ia) ms ON ms.id = c.id
  WHERE c.id NOT IN (SELECT id FROM acc{t - 1})
  ORDER BY score DESC, c.id LIMIT 1
),
acc{t} AS MATERIALIZED (SELECT * FROM acc{t - 1} UNION ALL SELECT * FROM sel{t})"""
        )
    parts.append(
        f"""
SELECT id AS {id_col}, rk AS mmr_rank,
       ROUND(rel, 6) AS rel_cosine, ROUND(score, 6) AS mmr_score
FROM acc{k} ORDER BY rk"""
    )
    return "".join(parts)


def retrieval_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Retrieval quality metrics per query — the evaluation face of
    the search/ANN family (recall gates exist per index; this scores
    ANY (query, doc, rank) run against graded ground truth, the
    harness a retrieval-backed curation or RAG pipeline tunes on):

    - ``recall_at_k`` = |top-k ∩ relevant| / |relevant|
    - ``mrr``         = 1 / rank of the first relevant hit (0 if none)
    - ``ndcg_at_k``   = DCG@k / IDCG@k with graded relevance,
      DCG = Σ rel_i / log2(rank_i + 1)

    Float discipline: each DCG/IDCG term is one log2 + division
    rounded to 6 dp, summed as DECIMAL(38,6) (exact), and the final
    ratio is one rounded IEEE division — bit-replayable in ANSI SQL.

    Graded qrels discipline (ADVICE r10): judged-but-IRRELEVANT rows
    (rel = 0, standard in TREC-style pools) count for NOTHING in the
    relevant-set metrics — n_relevant / recall / MRR see only rel > 0
    rows, so a rel=0 hit can neither inflate recall nor set MRR's
    first-hit rank. DCG/IDCG keep every graded row (a rel=0 term is
    identically 0, and ideal ranking orders it past every positive
    grade, so it never displaces gain within the cutoff).

    Scale: one rank-filtered equi-join of the run against the truth
    set, grouped per query; IDCG ranks the truth list per query with
    a window PARTITIONED BY QUERY (truth lists are judgment-sized —
    tens of rows per query — never corpus-sized). Queries with empty
    truth — or with NO rel > 0 judgment — are omitted (their metrics
    are undefined)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    q, d, rk, rel = query_col, doc_col, rank_col, rel_col
    term = lambda relc, rankc: F.round(  # noqa: E731 - shared shape
        relc.cast("double") / F.log2(rankc.cast("double") + F.lit(1.0)), 6
    ).cast("decimal(38,6)")

    hits = (
        results.filter(F.col(rk) <= k)
        .join(truth.select(q, d, rel), [q, d])
    )
    per_q_hits = hits.groupBy(q).agg(
        F.count_if(F.col(rel) > 0).alias("_n_hit"),
        F.min(F.when(F.col(rel) > 0, F.col(rk))).alias("_first"),
        F.sum(term(F.col(rel), F.col(rk))).alias("_dcg"),
    )
    ideal = truth.withColumn(
        "_irank",
        F.row_number().over(
            Window.partitionBy(q).orderBy(F.col(rel).desc(), F.col(d))
        ),
    ).filter(F.col("_irank") <= k)
    per_q_truth = (
        truth.filter(F.col(rel) > 0)
        .groupBy(q)
        .agg(F.count(F.lit(1)).alias("_n_rel"))
    )
    per_q_ideal = ideal.groupBy(q).agg(
        F.sum(term(F.col(rel), F.col("_irank"))).alias("_idcg")
    )
    return (
        per_q_truth.join(per_q_ideal, q)
        .join(per_q_hits, q, "left")
        .select(
            F.col(q),
            F.col("_n_rel").alias("n_relevant"),
            F.round(
                F.coalesce(F.col("_n_hit"), F.lit(0)) / F.col("_n_rel"), 6
            ).alias("recall_at_k"),
            F.coalesce(
                F.round(F.lit(1.0) / F.col("_first"), 6), F.lit(0.0)
            ).alias("mrr"),
            F.coalesce(
                F.round(
                    F.col("_dcg").cast("double")
                    / F.col("_idcg").cast("double"),
                    6,
                ),
                F.lit(0.0),
            ).alias("ndcg_at_k"),
        )
    )

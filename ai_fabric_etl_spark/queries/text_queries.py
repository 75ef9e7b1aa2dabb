"""Training-data pipeline query entries: dedup, similarity search,
text analysis, multimodal — registered in the driver contract.

Oracle-matched where ANSI-SQL-expressible; hash/LSH variants (engine
hash functions differ across engines) are rows-only here and verified
against their exact counterparts in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_fabric_etl_spark.operators import bpe, dedup, multimodal, similarity
from ai_fabric_etl_spark.operators.text import text_profile
from ai_fabric_etl_spark.queries.catalog import _t, register


def _bench_fixture(sf_dir: str, name: str, key: dict):
    """Stable on-disk fixture location for entries whose CORPUS-side
    index the bench must not rebuild per run (VERDICT r10 item 8: the
    operator such a row measures is the probe/admission — a real
    deployment indexes the corpus once). Context manager yielding
    ``(root, fresh)``: build under ``root`` when ``fresh`` is False.
    The staleness key (corpus size + knobs + fixture version — any
    change rebuilds) is pinned only when the caller's block exits
    CLEANLY; the build flock is released on EVERY exit path (ADVICE
    r12: a raise mid-build previously leaked the locked fd for the
    process lifetime, and any retry blocked forever on LOCK_EX
    instead of rebuilding).

    Safe for the ADMISSION gates specifically because their decisions
    are interleaving-invariant: re-running the same planted batch
    against the grown index converges to identical decisions and
    skips re-inserts (self-detection / batch-id routing / the
    embedding receipt) — the exact property the crash-window pytests
    prove.

    Location + concurrency (ADVICE r11): fixtures live under the
    repo-local ``.bench_cache/`` (gitignored) — per checkout, hence
    per user, never a world-shared predictable /tmp path another user
    could poison. When the key is stale an exclusive flock guards the
    build: a concurrent bench run blocks on the lock, re-checks the
    key once it acquires it, and finds the fixture fresh. ``key``
    must carry EVERY knob the persisted artifact depends on (corpus
    size, index parameters, synth shapes) — a changed knob rebuilds."""
    import contextlib
    import fcntl
    import json
    import os

    @contextlib.contextmanager
    def _cm():
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        root = os.path.join(
            repo_root, ".bench_cache",
            f"{name}_{os.path.basename(sf_dir.rstrip('/'))}",
        )
        os.makedirs(root, exist_ok=True)
        kp = os.path.join(root, "_fixture_key.json")

        def fresh() -> bool:
            if not os.path.exists(kp):
                return False
            with open(kp, encoding="utf-8") as fh:
                return json.load(fh) == key

        if fresh():
            yield root, True
            return
        with open(os.path.join(root, "_fixture_lock"), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                if fresh():  # another process built it while we waited
                    yield root, True
                else:
                    yield root, False
                    # clean build: pin the key (a raise above skips
                    # this, so the next run rebuilds)
                    with open(kp, "w", encoding="utf-8") as fh:
                        json.dump(key, fh)
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)

    return _cm()


# --- shared fixture builders: one definition per persisted index, used
# by BOTH the driver entries and bench.py's gate-trend block (VERDICT
# r11 item 5) so the staleness keys can never drift between them ---


def _fixture_phash_index(spark, sf_dir: str) -> str:
    import os

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    with _bench_fixture(
        sf_dir, "phash_idx",
        {"n_docs": docs.count(), "n_buckets": 64, "fixture_version": 1},
    ) as (root, fresh):
        idx = os.path.join(root, "index")
        if not fresh:
            multimodal.phash_index_write(
                multimodal.dhash64(
                    multimodal.synthesize_noise_images(docs), fake=False
                ),
                idx, n_buckets=64,
            )
    return idx


def _fixture_audio_index(spark, sf_dir: str) -> str:
    import os

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    with _bench_fixture(
        sf_dir, "audio_adm",
        # key carries EVERY build knob (ADVICE r11: n_frames was
        # missing — changing it silently reused a stale index)
        {"n_docs": docs.count(), "n_buckets": 64, "n_frames": 1024,
         "v": 1},
    ) as (root, fresh):
        idx = os.path.join(root, "index")
        if not fresh:
            corpus = multimodal.synthesize_noise_audio(docs, n_frames=1024)
            multimodal.phash_index_write(
                multimodal.audio_fp64(corpus, fake=False), idx,
                hash_col="afp", n_buckets=64,
            )
    return idx


def _fixture_video_index(spark, sf_dir: str) -> str:
    import os

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    with _bench_fixture(
        sf_dir, "video_adm",
        {"n_docs": docs.count(), "n_buckets": 64,
         "frames": "3+id%5", "v": 1},
    ) as (root, fresh):
        idx = os.path.join(root, "index")
        if not fresh:
            corpus = multimodal.synthesize_noise_video(docs)
            multimodal.video_index_write(
                multimodal.video_frame_hashes(corpus, fake=False), idx,
                n_buckets=64,
            )
    return idx


def _synth_pair_text(prefix: str):
    """Deterministic 8-word synthetic text per doc_id (the paired
    gate's text side — prefix namespaces the content stream)."""
    return F.concat_ws(" ", *[
        F.md5(F.concat(F.lit(prefix), F.col("doc_id").cast("string"),
                       F.lit(f":{k}")).cast("binary"))
        for k in range(8)
    ])


def _fixture_paired_indexes(spark, sf_dir: str) -> tuple[str, str]:
    import os

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    with _bench_fixture(
        sf_dir, "paired_adm",
        # full build config (ADVICE r11): the text index's minhash
        # knobs and synth shape, plus the image index's bucketing
        # v2: bucketed sig store (sb=doc_id%64 — pruned exact-Jaccard
        # verify, VERDICT r12 item 4)
        {"n_docs": docs.count(), "n_buckets": 64, "num_hashes": 32,
         "bands": 8, "n": 3, "text_synth": "md5x8:txt:", "v": 2},
    ) as (root, fresh):
        tidx = os.path.join(root, "text_index")
        iidx = os.path.join(root, "image_index")
        if not fresh:
            dedup.minhash_index_write(
                docs.select("doc_id", _synth_pair_text("txt:").alias("text")),
                tidx,
            )
            multimodal.phash_index_write(
                multimodal.dhash64(
                    multimodal.synthesize_noise_images(docs), fake=False
                ),
                iidx, n_buckets=64,
            )
    return tidx, iidx


def _fixture_emb_index(spark, sf_dir: str) -> str:
    import os

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    with _bench_fixture(
        sf_dir, "emb_adm",
        {"n_vecs": emb.count(), "dim": 64, "n_tables": 6, "seed": 13,
         "target_occupancy": 16, "extra_planes": 4,
         "max_resplit_rounds": 2, "v": 1},
    ) as (root, fresh):
        idx = os.path.join(root, "index")
        if not fresh:
            similarity.emb_neardup_index_write(emb, idx)
    return idx

# shared SQL fragments for the oracle side
_TOK = "string_split_regex(trim(text), '\\s+')"
_SH = (
    "CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(range(1, len(t)-1), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) "
    "ELSE [array_to_string(t, ' ')] END"
)


def _hits(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_intersect(list_distinct({_TOK}), [{lst}]))"


@register(
    "text_profile",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, text,
               len({_TOK}) AS n_tokens,
               length(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_bpe_tokens,
               length(text) AS n_chars_measured,
               {_hits(('the', 'a', 'of', 'and', 'to'))} AS stopword_hits,
               {_hits(('the', 'a', 'of', 'and', 'to'))} AS h_en,
               {_hits(('der', 'und', 'die', 'das', 'nicht'))} AS h_de,
               {_hits(('le', 'la', 'et', 'les', 'des'))} AS h_fr,
               {_hits(('el', 'la', 'los', 'que', 'y'))} AS h_es,
               {_hits(('de', 'shi', 'le', 'wo', 'ni'))} AS h_zh
        FROM documents
    )
    SELECT doc_id, n_tokens, n_bpe_tokens, n_chars_measured, stopword_hits,
           GREATEST(0, 100
             - 20 * (CASE WHEN n_tokens < 10 THEN 1 ELSE 0 END)
             - 5 * ((CASE WHEN n_chars_measured < 100 THEN 1 ELSE 0 END)
                  + (CASE WHEN stopword_hits = 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN (CASE WHEN n_tokens > 0
                                THEN n_chars_measured / n_tokens
                                ELSE 0.0 END) > 12.0 THEN 1 ELSE 0 END))
           ) AS quality_score,
           CASE WHEN GREATEST(h_en, h_de, h_fr, h_es, h_zh) = 0 THEN 'und'
                WHEN h_en >= GREATEST(h_de, h_fr, h_es, h_zh) THEN 'en'
                WHEN h_de >= GREATEST(h_fr, h_es, h_zh) THEN 'de'
                WHEN h_fr >= GREATEST(h_es, h_zh) THEN 'fr'
                WHEN h_es >= h_zh THEN 'es'
                ELSE 'zh' END AS predicted_lang,
           md5(array_to_string({_TOK}, ' ')) AS fingerprint,
           md5(array_to_string(({_TOK})[1:8], ' ')) AS prefix_fingerprint
    FROM base
    """,
)
def q_text_profile(spark, sf_dir):
    """Text analysis suite: token counts (whitespace + BPE-ish regex),
    stopword/quality scoring (canonical silver formula), stopword
    language-ID heuristic, document fingerprints."""
    return text_profile(_t(spark, sf_dir, "documents"))


_PII_SUFFIX_SQL = (
    "' contact user' || CAST(doc_id AS VARCHAR) || '@example.com "
    "visit https://ex.org/p/' || CAST(doc_id AS VARCHAR) || "
    "' ip 10.1.2.3 call +1 (555) 123-4567'"
)


@register(
    "text_clean_redact",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id, text || {_PII_SUFFIX_SQL} AS raw FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(raw,
                   'https?://[^\\s]+', '<URL>', 'g'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                   '\\b([0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b', '<IP>', 'g'),
                   '\\+?\\b[0-9][0-9()\\-. ]{{7,}}[0-9]\\b', '<PHONE>', 'g'),
                   '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
                   '\\s+', ' ', 'g')) AS cleaned,
           length(regexp_extract_all(raw, 'https?://[^\\s]+')) AS n_urls,
           length(regexp_extract_all(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_emails,
           length(regexp_extract_all(raw,
               '\\b([0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b')) AS n_ipv4
    FROM aug
    """,
)
def q_text_clean_redact(spark, sf_dir):
    """Training-data hygiene pass, value-verified end to end: plant
    deterministic PII (email/URL/IP/phone derived from doc_id) into
    every document, then clean_text(redact_pii(...)) must produce the
    exact placeholder-substituted strings the oracle computes with the
    same RE2/Java-portable regexes. Pure JVM regexp_replace — no
    Python in the pass."""
    from ai_fabric_etl_spark.operators.text import clean_text, pii_counts, redact_pii

    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com visit https://ex.org/p/"),
        F.col("doc_id").cast("string"),
        F.lit(" ip 10.1.2.3 call +1 (555) 123-4567"),
    )
    counts = pii_counts(raw)
    return d.select(
        "doc_id",
        clean_text(redact_pii(raw)).alias("cleaned"),
        counts["n_urls"].alias("n_urls"),
        counts["n_emails"].alias("n_emails"),
        counts["n_ipv4"].alias("n_ipv4"),
    )


@register(
    "dedup_exact",
    oracle=f"""
    SELECT md5(array_to_string({_TOK}, ' ')) AS fingerprint,
           COUNT(*) AS dup_count,
           MIN(doc_id) AS canonical_doc_id
    FROM documents
    GROUP BY 1
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on the normalized-content digest."""
    return dedup.exact_dedup_groups(_t(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
    sh AS (SELECT doc_id, {_SH} AS s FROM tok),
    ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS inter
          FROM ex a JOIN ex b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
    SELECT doc_a, doc_b, inter / (n_a + n_b - inter) AS jaccard
    FROM p
    WHERE inter / (n_a + n_b - inter) >= 0.5
    """,
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """3-gram shingle Jaccard near-dup pairs via inverted-index join
    (no cross join; shuffle scales with shared-shingle pairs)."""
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5
    )


@register(
    "dedup_drop_neardups",
    oracle=f"""
    WITH RECURSIVE tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
    sh AS (SELECT doc_id, {_SH} AS s FROM tok),
    ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS inter
          FROM ex a JOIN ex b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
    pairs AS (SELECT doc_a, doc_b FROM p
              WHERE inter / (n_a + n_b - inter) >= 0.5),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    walk(u, comp) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.u, w.comp FROM edges e JOIN walk w ON e.v = w.u
    ),
    comp AS (SELECT u AS doc_id, MIN(comp) AS component FROM walk GROUP BY u)
    SELECT d.doc_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    WHERE c.component IS NULL OR c.component = d.doc_id
    """,
)
def q_dedup_drop_neardups(spark, sf_dir):
    """End-to-end near-dedup: exact Jaccard pairs -> connected
    components (min-label propagation) -> keep one representative per
    cluster. The oracle computes the same transitive closure with a
    recursive CTE."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    return dedup.drop_near_duplicates(docs, pairs).select("doc_id")


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
    sh AS (SELECT doc_id, {_SH} AS s FROM tok),
    ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS inter
          FROM ex a JOIN ex b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
    SELECT doc_a, doc_b, inter / (n_a + n_b - inter) AS jaccard
    FROM p
    WHERE inter / (n_a + n_b - inter) >= 0.5
    """,
)
def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash(32)+LSH(8 bands) candidate pairs, exact-Jaccard
    verified. Oracle is the EXACT shingle-Jaccard pair set: LSH
    candidate generation is probabilistic, but the post-verification
    output equals the exact pair set whenever band recall holds — so
    a green hash here is a driver-visible recall gate (a recall
    regression surfaces as missing rows), per VERDICT r1 item 5.
    Hashed-shingle Jaccard equals string-shingle Jaccard absent
    xxhash64 collisions within a doc (none at this corpus size)."""
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5
    ).orderBy("doc_a", "doc_b")


@register(
    "dedup_span_coverage",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOK} AS t FROM documents),
    b2 AS (SELECT doc_id, t, len(t) AS n FROM base),
    pos AS (SELECT doc_id, unnest(generate_series(0, n - 5)) AS pos, t
            FROM b2 WHERE n >= 5),
    grams AS (SELECT doc_id, pos,
                     array_to_string(t[pos + 1 : pos + 5], ' ') AS gram
              FROM pos),
    dup AS (SELECT gram FROM grams
            GROUP BY gram HAVING MIN(doc_id) <> MAX(doc_id)),
    hits AS (SELECT g.doc_id, g.pos,
                    LAG(g.pos) OVER (PARTITION BY g.doc_id
                                     ORDER BY g.pos) AS prev
             FROM grams g JOIN dup USING (gram)),
    cov AS (SELECT doc_id, COUNT(*) AS dup_grams,
                   SUM(CASE WHEN prev IS NULL THEN 5
                            ELSE LEAST(5, pos - prev) END) AS covered
            FROM hits GROUP BY doc_id)
    SELECT b2.doc_id,
           b2.n AS n_tokens,
           COALESCE(cov.dup_grams, 0) AS dup_grams,
           CAST(COALESCE(cov.covered, 0) AS BIGINT) AS covered_tokens,
           ROUND(CAST(COALESCE(cov.covered, 0) AS DOUBLE) / b2.n, 6)
             AS dup_coverage
    FROM b2 LEFT JOIN cov USING (doc_id)
    """,
)
def q_dedup_span_coverage(spark, sf_dir):
    """Substring-level duplication coverage (Lee et al. span dedup at
    word-5-gram granularity): per document, the token fraction covered
    by 5-grams occurring in at least one OTHER document — the signal
    that catches boilerplate/quoted passages document-level dedup
    misses. Engine hashes grams (xxhash64) where the oracle carries
    the exact strings, so any recall loss from hashing would surface
    as a value mismatch."""
    return dedup.duplicate_span_coverage(
        _t(spark, sf_dir, "documents"), k=5
    )


@register(
    "dedup_span_removal",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOK} AS t FROM documents),
    b2 AS (SELECT doc_id, t, len(t) AS n FROM base),
    pos AS (SELECT doc_id, unnest(generate_series(0, n - 5)) AS pos, t
            FROM b2 WHERE n >= 5),
    grams AS (SELECT doc_id, pos,
                     array_to_string(t[pos + 1 : pos + 5], ' ') AS gram
              FROM pos),
    dup AS (SELECT gram FROM grams
            GROUP BY gram HAVING MIN(doc_id) <> MAX(doc_id)),
    cov AS (SELECT DISTINCT doc_id, tp FROM (
              SELECT g.doc_id,
                     unnest(generate_series(g.pos + 1, g.pos + 5)) AS tp
              FROM grams g JOIN dup USING (gram))),
    tok2 AS (SELECT doc_id, tp, t[tp] AS tok FROM (
               SELECT doc_id, unnest(generate_series(1, n)) AS tp, t
               FROM b2)),
    kept AS (SELECT k.doc_id, k.tp, k.tok FROM tok2 k
             WHERE NOT EXISTS (SELECT 1 FROM cov
                               WHERE cov.doc_id = k.doc_id
                                 AND cov.tp = k.tp)),
    rebuilt AS (SELECT doc_id, COUNT(*) AS n_kept,
                       string_agg(tok, ' ' ORDER BY tp) AS clean_text
                FROM kept GROUP BY doc_id)
    SELECT b2.doc_id, b2.n AS n_tokens,
           b2.n - COALESCE(r.n_kept, 0) AS n_removed,
           COALESCE(r.clean_text, '') AS clean_text
    FROM b2 LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def q_dedup_span_removal(spark, sf_dir):
    """Span-level dedup REMOVAL (dedup.remove_duplicate_spans — the
    action half of dedup_span_coverage, Lee et al.'s 'delete the
    duplicated span, keep the document'): every token covered by a
    cross-doc-duplicated word-5-gram is dropped and the survivors
    rejoin in order; the corpus's planted exact-duplicate documents
    collapse to ''. Full reconstructed-text value oracle — the engine
    works on xxhash64 gram keys while the oracle carries exact
    strings, so a hash-level recall defect surfaces as a text
    mismatch."""
    return dedup.remove_duplicate_spans(
        _t(spark, sf_dir, "documents"), k=5
    )


@register(
    "text_bpe_roundtrip",
    oracle=f"""
    SELECT doc_id,
           len({_TOK}) AS n_words,
           length(array_to_string({_TOK}, ' ')) AS n_norm_chars,
           TRUE AS roundtrip_ok
    FROM documents
    """,
)
def q_text_bpe_roundtrip(spark, sf_dir):
    """BPE tokenizer train + encode + decode over the corpus
    (operators/bpe.py, Sennrich et al. ACL 2016): merges are learned
    from the corpus's own word-frequency table (top-4000 words, 60
    merges — deterministic tie-breaks), every document is encoded with
    the Arrow-batched greedy encoder, and ``roundtrip_ok`` asserts
    decode(encode(text)) reproduces the whitespace-normalized source
    EXACTLY — any encoder/decoder defect flips a row to FALSE and
    fails the value hash. Merge-order correctness itself is pinned by
    tests/test_bpe.py against an independent from-scratch
    implementation (DuckDB cannot express the iterative merge loop)."""
    docs = _t(spark, sf_dir, "documents")
    merges = bpe.bpe_train(docs, num_merges=60, max_words=4000)
    enc = bpe.bpe_encode(docs, merges)
    norm = F.concat_ws(" ", F.split(F.trim(F.col("text")), r"\s+"))
    return enc.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_words"),
        F.length(norm).alias("n_norm_chars"),
        (bpe.bpe_decode(F.col("pieces")) == norm).alias("roundtrip_ok"),
    )


@register(
    "text_nb_classifier",
    oracle=f"""
    WITH base AS (SELECT doc_id, lang, {_TOK} AS t FROM documents),
    train AS (SELECT * FROM base WHERE doc_id % 5 <> 0 AND lang IS NOT NULL),
    test AS (SELECT doc_id, lang, t, len(t) AS n FROM base WHERE doc_id % 5 = 0),
    tok AS (SELECT lang AS y, unnest(t) AS w FROM train),
    cc AS (SELECT y, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    ny AS (SELECT y, COUNT(*) AS nt FROM tok GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM tok),
    dt AS (SELECT COUNT(*) AS dtot FROM train),
    cls AS (
      SELECT dy.y,
             CAST(ROUND(ln(2 * ny.nt + v.v), 6) AS DECIMAL(18,6)) AS b,
             CAST(ROUND(ln(dy.d), 6) AS DECIMAL(18,6))
               - CAST(ROUND(ln(dt.dtot), 6) AS DECIMAL(18,6)) AS prior
      FROM (SELECT lang AS y, COUNT(*) AS d FROM train GROUP BY 1) dy
      JOIN ny USING (y) CROSS JOIN v CROSS JOIN dt
    ),
    tm AS (SELECT doc_id, w, COUNT(*) AS m
           FROM (SELECT doc_id, unnest(t) AS w FROM test) GROUP BY 1, 2),
    hits AS (
      SELECT tm.doc_id, cc.y,
             CAST(SUM(tm.m * CAST(ROUND(ln(2 * cc.c + 1), 6)
                                  AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS hs
      FROM tm JOIN cc USING (w) GROUP BY 1, 2
    ),
    scored AS (
      SELECT g.doc_id, g.actual, g.y,
             COALESCE(h.hs, CAST(0 AS DECIMAL(38,6))) - g.n * g.b + g.prior
               AS score
      FROM (SELECT test.doc_id, test.lang AS actual, test.n, cls.*
            FROM test CROSS JOIN cls) g
      LEFT JOIN hits h ON g.doc_id = h.doc_id AND g.y = h.y
    ),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, y) AS rn
          FROM scored)
    SELECT doc_id, y AS pred_lang, actual AS actual_lang,
           (y = actual) AS is_correct,
           CAST(score * 1000000 AS BIGINT) AS score_micro
    FROM r WHERE rn = 1
    ORDER BY doc_id
    """,
)
def q_text_nb_classifier(spark, sf_dir):
    """Model-based quality/domain filtering (text.nb_classify): a
    multinomial Naive Bayes classifier TRAINED as two aggregations and
    scored as one equi-join + per-doc argmax — the fastText-shaped
    linear filter GPT-3/LLaMA-style pipelines run over every document
    at corpus scale. Here it predicts ``lang`` for the 20% holdout
    from the 80% train split; the oracle refits the identical model
    relationally, so smoothing, priors, tie-breaks, and the integer
    micro-nat scores must all match bit-for-bit."""
    from ai_fabric_etl_spark.operators.text import nb_classify

    return nb_classify(_t(spark, sf_dir, "documents")).orderBy("doc_id")


@register(
    "text_bigram_lm_nll",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
    b AS (SELECT doc_id, t, len(t) AS n FROM tok),
    ex AS (SELECT unnest(t) AS w1 FROM b),
    uni AS (SELECT w1, COUNT(*) AS u FROM ex GROUP BY w1),
    v AS (SELECT COUNT(*) AS v FROM uni),
    idx AS (SELECT doc_id, unnest(generate_series(1, n - 1)) AS i, t
            FROM b WHERE n >= 2),
    pg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM idx),
    big AS (SELECT w1, w2, COUNT(*) AS c FROM pg GROUP BY w1, w2),
    terms AS (
      SELECT pg.doc_id,
             CAST(ROUND(ln(CAST(2 * big.c + 1 AS DOUBLE)
                           / CAST(2 * uni.u + v.v AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS term
      FROM pg
      JOIN big USING (w1, w2)
      JOIN uni USING (w1)
      CROSS JOIN v
    ),
    agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
                   CAST(-CAST(SUM(term) AS DECIMAL(38,6)) * 1000000
                        AS BIGINT) AS s_micro
            FROM terms GROUP BY doc_id)
    SELECT b.doc_id,
           COALESCE(agg.n_bigrams, 0) AS n_bigrams,
           CAST(FLOOR((2 * agg.s_micro + agg.n_bigrams)
                      / (2.0 * agg.n_bigrams)) AS BIGINT) AS avg_nll_micro
    FROM b LEFT JOIN agg USING (doc_id)
    """,
)
def q_text_bigram_lm_nll(spark, sf_dir):
    """Corpus-trained bigram LM scoring (text.bigram_lm_scores —
    the CCNet LM-perplexity quality-filter signal at SQL-verifiable
    complexity): per document, the mean negative log-probability of
    its token transitions under the corpus's own add-half-smoothed
    bigram statistics, in exact integer micro-nats. Full per-doc
    value oracle: the integer-ratio (2c+1)/(2u+V) construction makes
    the single ln input bit-identical on both engines, terms round to
    6 decimals and sum as exact decimals, and the mean is a half-up
    INTEGER division — no float rounding anywhere in the output (the
    earlier ROUND(-s/n, 6) form hit a .5 boundary at sf0.1 where the
    engines round doubles differently)."""
    from ai_fabric_etl_spark.operators.text import bigram_lm_scores

    return bigram_lm_scores(_t(spark, sf_dir, "documents"))


@register(
    "text_trigram_backoff_nll",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
    b AS (SELECT doc_id, t, len(t) AS n,
          ('0x' || substr(md5(COALESCE(CAST(doc_id AS VARCHAR), '__NULL__')
                              || '-trigram'), 1, 15))::BIGINT % 5 AS hb
          FROM tok),
    train AS (SELECT * FROM b WHERE hb <> 0),
    test AS (SELECT * FROM b WHERE hb = 0),
    uni AS (SELECT w, COUNT(*) AS u
            FROM (SELECT unnest(t) AS w FROM train) GROUP BY w),
    nv AS (SELECT COUNT(*) AS v FROM uni),
    nt AS (SELECT SUM(n) AS nn FROM train),
    big AS (SELECT t[i] AS w1, t[i + 1] AS w2, COUNT(*) AS c2
            FROM (SELECT unnest(generate_series(1, n - 1)) AS i, t
                  FROM train WHERE n >= 2)
            GROUP BY 1, 2),
    tri AS (SELECT t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3,
                   COUNT(*) AS c3
            FROM (SELECT unnest(generate_series(1, n - 2)) AS i, t
                  FROM train WHERE n >= 3)
            GROUP BY 1, 2, 3),
    tg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
           FROM (SELECT doc_id, unnest(generate_series(1, n - 2)) AS i, t
                 FROM test WHERE n >= 3)),
    terms AS (
      SELECT tg.doc_id,
             CAST(ROUND(CASE
               WHEN tri.c3 IS NOT NULL THEN
                 ln(CAST(tri.c3 AS DOUBLE) / CAST(b12.c2 AS DOUBLE))
               WHEN b23.c2 IS NOT NULL THEN
                 ln(CAST(0.4 AS DOUBLE) * CAST(b23.c2 AS DOUBLE)
                    / CAST(u2.u AS DOUBLE))
               ELSE
                 ln(CAST(0.16 AS DOUBLE)
                    * CAST(2 * COALESCE(u3.u, 0) + 1 AS DOUBLE)
                    / CAST(2 * nt.nn + nv.v AS DOUBLE))
             END, 6) AS DECIMAL(18,6)) AS term
      FROM tg
      LEFT JOIN tri ON tg.w1 = tri.w1 AND tg.w2 = tri.w2 AND tg.w3 = tri.w3
      LEFT JOIN big b12 ON tg.w1 = b12.w1 AND tg.w2 = b12.w2
      LEFT JOIN big b23 ON tg.w2 = b23.w1 AND tg.w3 = b23.w2
      LEFT JOIN uni u2 ON tg.w2 = u2.w
      LEFT JOIN uni u3 ON tg.w3 = u3.w
      CROSS JOIN nv CROSS JOIN nt
    ),
    agg AS (SELECT doc_id, COUNT(*) AS n_trigrams,
                   CAST(-CAST(SUM(term) AS DECIMAL(38,6)) * 1000000
                        AS BIGINT) AS s_micro
            FROM terms GROUP BY doc_id)
    SELECT test.doc_id,
           COALESCE(agg.n_trigrams, 0) AS n_trigrams,
           CAST(FLOOR((2 * agg.s_micro + agg.n_trigrams)
                      / (2.0 * agg.n_trigrams)) AS BIGINT) AS avg_nll_micro
    FROM test LEFT JOIN agg USING (doc_id)
    """,
)
def q_text_trigram_backoff_nll(spark, sf_dir):
    """Stupid-backoff trigram LM scoring (text.trigram_lm_scores,
    Brants et al. EMNLP 2007) of the 20% holdout against the 80%
    train split's count tables — the higher-order CCNet perplexity
    signal with all three backoff branches LIVE (the bigram entry
    trains on the full corpus, so its backoff path never fires).
    The ~20% holdout is the md5-bucket split (r10 — replayable in
    ANSI SQL and string-id-safe, vs the r9 numeric-only `% 5`).
    Full per-doc value oracle in integer micro-nats: every branch is
    one IEEE expression in the same evaluation order on both engines
    (integer-ratio ln inputs; the 0.4/0.16 backoff multipliers cast
    to double explicitly so DuckDB can't go exact-decimal), terms
    round to 6 dp and sum as exact decimals, half-up integer mean."""
    from ai_fabric_etl_spark.operators.text import trigram_lm_scores

    return trigram_lm_scores(_t(spark, sf_dir, "documents"))


@register(
    "text_line_dedup",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             CASE
               WHEN doc_id % 3 = 0 THEN
                 'NEWSLETTER HEADER subscribe today' || chr(10) || text
                 || chr(10) || 'footer unsubscribe at example dot com'
               WHEN doc_id % 7 = 0 THEN
                 text || chr(10)
                 || 'footer unsubscribe at example dot com'
               ELSE text
             END AS text
      FROM documents
    ),
    ln AS (
      SELECT doc_id, unnest(generate_series(1, len(l))) AS pos, l
      FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM src)
    ),
    lines AS (SELECT doc_id, pos, l[pos] AS line, trim(l[pos]) AS norm
              FROM ln),
    dup AS (SELECT norm FROM lines WHERE length(norm) >= 1
            GROUP BY norm HAVING MIN(doc_id) <> MAX(doc_id)),
    kept AS (SELECT * FROM lines WHERE norm NOT IN (SELECT norm FROM dup)),
    rebuilt AS (SELECT doc_id, COUNT(*) AS n_kept,
                       string_agg(line, chr(10) ORDER BY pos) AS clean_text
                FROM kept GROUP BY doc_id),
    totals AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
    SELECT t.doc_id, t.n_lines,
           t.n_lines - COALESCE(r.n_kept, 0) AS n_removed,
           COALESCE(r.clean_text, '') AS clean_text
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def q_text_line_dedup(spark, sf_dir):
    """CCNet/RefinedWeb line-level boilerplate removal
    (text.remove_boilerplate_lines) on a corpus with DETERMINISTIC
    planted boilerplate (the synthetic docs are single-line, so the
    entry grafts a shared newsletter header onto every third doc and
    a shared footer onto 3- and 7-multiples): the shared lines must
    vanish from every document, unique lines survive in order, and
    docs whose entire content is cross-doc duplicated (the corpus's
    planted exact dups) collapse to empty. Full reconstructed-text
    value oracle."""
    from ai_fabric_etl_spark.operators.text import remove_boilerplate_lines

    src = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("NEWSLETTER HEADER subscribe today\n"),
                F.col("text"),
                F.lit("\nfooter unsubscribe at example dot com"),
            ),
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit("\nfooter unsubscribe at example dot com"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return remove_boilerplate_lines(src)


@register(
    "text_unigram_roundtrip",
    oracle=f"""
    SELECT doc_id,
           len({_TOK}) AS n_words,
           length(array_to_string({_TOK}, ' ')) AS n_norm_chars,
           TRUE AS roundtrip_ok
    FROM documents
    """,
)
def q_text_unigram_roundtrip(spark, sf_dir):
    """Unigram-LM tokenizer train + Viterbi encode + decode
    (operators/unigram.py, the SentencePiece model_type=unigram
    algorithm; Kudo ACL 2018): pieces are learned by EM + pruning over
    the corpus's own word-frequency table (top-2000 words, 256-piece
    vocab), every document Viterbi-encodes under the final log-probs,
    and ``roundtrip_ok`` value-verifies decode(encode(text)) against
    the whitespace-normalized source per row. Lattice marginals and
    Viterbi optimality are pinned against brute-force segmentation
    enumeration in tests/test_unigram.py (the EM loop is not
    SQL-expressible). With BPE (text_bpe_roundtrip) this completes
    both mainstream subword-tokenizer families."""
    from ai_fabric_etl_spark.operators import unigram

    docs = _t(spark, sf_dir, "documents")
    model = unigram.unigram_train(
        docs, vocab_size=256, max_words=2000, seed_size=2048
    )
    enc = unigram.unigram_encode(docs, model)
    norm = F.concat_ws(" ", F.split(F.trim(F.col("text")), r"\s+"))
    return enc.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_words"),
        F.length(norm).alias("n_norm_chars"),
        (unigram.unigram_decode(F.col("pieces")) == norm).alias(
            "roundtrip_ok"
        ),
    )


@register(
    "text_wordpiece_roundtrip",
    oracle=f"""
    SELECT doc_id,
           len({_TOK}) AS n_words,
           length(array_to_string({_TOK}, ' ')) AS n_norm_chars,
           TRUE AS roundtrip_ok
    FROM documents
    """,
)
def q_text_wordpiece_roundtrip(spark, sf_dir):
    """WordPiece tokenizer train + encode + decode
    (operators/wordpiece.py; Schuster & Nakajima 2012 / BERT): the
    vocabulary is learned by LIKELIHOOD-ranked merges (count(ab) /
    (count(a)*count(b)), exact-integer comparisons) over the corpus's
    word-frequency table (top-4000 words, 60 merges), every document
    encodes with the Arrow-batched greedy longest-match-first
    (MaxMatch) encoder, and ``roundtrip_ok`` asserts
    decode(encode(text)) reproduces the whitespace-normalized source
    EXACTLY per row. Merge scoring and MaxMatch are pinned against
    hand-computed cases in tests/test_wordpiece.py (the merge loop is
    not SQL-expressible). With BPE and Unigram-LM this completes all
    three mainstream subword families."""
    from ai_fabric_etl_spark.operators import wordpiece

    docs = _t(spark, sf_dir, "documents")
    pieces = wordpiece.wordpiece_train(docs, num_merges=60, max_words=4000)
    enc = wordpiece.wordpiece_encode(docs, pieces)
    norm = F.concat_ws(" ", F.split(F.trim(F.col("text")), r"\s+"))
    return enc.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_words"),
        F.length(norm).alias("n_norm_chars"),
        (wordpiece.wordpiece_decode(F.col("pieces")) == norm).alias(
            "roundtrip_ok"
        ),
    )


@register("dedup_simhash")
def q_dedup_simhash(spark, sf_dir):
    """SimHash-64 near-dup pairs (hamming<=3) via 16-bit-chunk
    pigeonhole banding. Rows-only (the fingerprint is xxhash-defined);
    the pipeline itself is driver-gated by dedup_simhash_planted."""
    return dedup.simhash_near_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=3
    ).orderBy("doc_a", "doc_b")


@register(
    "dedup_simhash_planted",
    oracle="""
    SELECT doc_id AS doc_a, doc_id + 10000 AS doc_b, 0 AS hamming
    FROM documents WHERE doc_id < 50
    """,
)
def q_dedup_simhash_planted(spark, sf_dir):
    """Driver-gated SimHash recall: 50 exact-duplicate documents are
    planted (ids +10000); identical text gives identical fingerprints,
    so every planted pair MUST surface at hamming 0 — structurally,
    via the shared-chunk equality join, not by luck. The entry
    returns only the planted slice so the oracle can assert the full
    value set; a banding or fingerprint regression loses rows."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    pairs = dedup.simhash_near_pairs(docs.unionByName(copies), max_hamming=3)
    return pairs.filter(
        (F.col("doc_b") == F.col("doc_a") + 10000) & (F.col("doc_a") < 50)
    )


@register(
    "dedup_incremental_planted",
    oracle="""
    SELECT doc_id AS doc_a, doc_id + 20000 AS doc_b,
           CAST(1.0 AS DOUBLE) AS jaccard
    FROM documents WHERE doc_id < 50
    """,
)
def q_dedup_incremental_planted(spark, sf_dir):
    """Driver-gated INCREMENTAL dedup (operators/dedup.py
    minhash_index_write / minhash_dedup_incremental): the corpus is
    indexed once (persisted band table + signatures), then a new batch
    is screened against the index WITHOUT re-signing the corpus — the
    admission pattern a continuously-ingested 100 TB corpus needs
    (O(batch) work per batch, map-side join against the
    band-partitioned index, no corpus shuffle).

    50 exact copies of corpus docs (ids +20000) are planted as the new
    batch; identical text gives identical signatures, so every planted
    doc MUST surface against its original at exact Jaccard 1.0 —
    structurally, via the band equi-join + exact verification, not by
    luck. The entry returns the planted slice so the oracle asserts
    the full value set; an indexing or screening regression loses
    rows. Incremental == batch-path parity on mixed novel/dup batches
    is pytest-gated (test_dedup_similarity.py)."""
    import os
    import tempfile

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    idx = os.path.join(
        tempfile.gettempdir(),
        f"minhash_idx_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    dedup.minhash_index_write(docs, idx)
    batch = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "text"
    )
    out = dedup.minhash_dedup_incremental(batch, idx, threshold=0.5)
    return out.filter(
        (F.col("doc_b") == F.col("doc_a") + 20000) & (F.col("doc_a") < 50)
    )


@register(
    "emb_semdedup_planted",
    oracle="""
    SELECT vec_id + 30000 AS vec_id, vec_id AS dup_of
    FROM embeddings WHERE vec_id < 50
    """,
)
def q_emb_semdedup_planted(spark, sf_dir):
    """SemDeDup (similarity.semdedup_prune, Abbas et al. 2023):
    k-means-cell-scoped semantic dedup — the quadratic cosine search
    runs only WITHIN a cell, so pair work is bounded by the largest
    cell, not the corpus (grow k with data; oversized cells raise).

    Structural full-value oracle: 50 exact copies of corpus vectors
    (ids +30000) are planted. Identical vectors share a centroid
    argmax and centroid similarity, and the original's smaller id
    wins the keep-priority tiebreak — so every planted copy MUST be
    dropped (its match is the original when kept, else the kept
    representative the original matched, whose cosine is identical),
    and, because sf corpus vectors are mutually below the 0.99
    threshold while copies sit at 1.0, each copy's dup_of IS its
    original. A clustering, ordering, or greedy-scan regression
    breaks the pair set. Kept/threshold invariants are pytest-gated
    (test_dedup_similarity.py)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 30000).alias("vec_id"), "embedding"
    )
    out = similarity.semdedup_prune(
        emb.unionByName(copies), k=8, threshold=0.99
    )
    return (
        out.filter(~F.col("kept") & (F.col("vec_id") >= 30000))
        .select("vec_id", "dup_of")
    )


_KNN_DOT = (
    "(SELECT SUM(x * y) FROM (SELECT unnest(q.qv)::DOUBLE AS x, unnest(c.cv)::DOUBLE AS y))"
)
_KNN_NQ = "sqrt((SELECT SUM(x * x) FROM (SELECT unnest(q.qv)::DOUBLE AS x)))"
_KNN_NC = "sqrt((SELECT SUM(y * y) FROM (SELECT unnest(c.cv)::DOUBLE AS y)))"


@register(
    "emb_knn_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    p AS (SELECT query_id, neighbor_id,
                 {_KNN_DOT} / ({_KNN_NQ} * {_KNN_NC}) AS cosine_sim
          FROM q, c WHERE query_id != neighbor_id),
    r AS (SELECT query_id, neighbor_id, cosine_sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, neighbor_id) AS knn_rank
          FROM p)
    SELECT query_id, neighbor_id, knn_rank, cosine_sim FROM r WHERE knn_rank <= 5
    """,
)
def q_emb_knn_bruteforce(spark, sf_dir):
    """Exact cosine top-5 for 8 query vectors: broadcast queries ×
    corpus scan, JVM-side zip_with/aggregate dot product."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)
    return out.withColumnRenamed("rank", "knn_rank")


@register("emb_knn_ivf")
def q_emb_knn_ivf(spark, sf_dir):
    """Approximate top-5 via IVF k-means cells (n_probe=4 of 16).
    Rows-only (k-means centroids have no DuckDB twin); recall vs
    brute force measured in pytest and gated by emb_knn_ivf_recall."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.ivf_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)
    return out.withColumnRenamed("rank", "knn_rank").orderBy("query_id", "knn_rank")


@register("emb_knn_lsh")
def q_emb_knn_lsh(spark, sf_dir):
    """Approximate top-5 via multi-table hyperplane LSH (the 100 TB
    path). Rows-only; recall vs brute force measured in pytest and
    gated by emb_knn_lsh_recall."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.lsh_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)
    return out.withColumnRenamed("rank", "knn_rank").orderBy("query_id", "knn_rank")


def _knn_hits(spark, sf_dir, approx_fn, k=5):
    """(query_id, recall) of an approximate knn vs the exact top-k."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    bf = similarity.brute_force_topk(emb, q, k=k).select("query_id", "neighbor_id")
    ap = approx_fn(emb, q, k=k).select("query_id", "neighbor_id")
    hits = (
        bf.join(ap, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg((F.count(F.lit(1)) / F.lit(float(k))).alias("recall"))
    )
    return (
        bf.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select("query_id", F.coalesce("recall", F.lit(0.0)).alias("recall"))
    )


@register(
    "emb_knn_lsh_recall",
    oracle="SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 8",
)
def q_emb_knn_lsh_recall(spark, sf_dir):
    """Driver-visible recall gate (VERDICT r1 item 5): the query ids
    whose LSH recall@5 meets the 0.5 per-query floor. The oracle
    expects ALL 8 query ids, so an LSH recall regression shows up as
    a row-count/hash mismatch in the correctness run. Deterministic:
    hyperplanes are seeded."""
    rec = _knn_hits(spark, sf_dir, similarity.lsh_topk)
    return rec.filter(F.col("recall") >= 0.5).select("query_id")


@register(
    "emb_knn_ivf_recall",
    oracle="SELECT 8 AS n_queries, TRUE AS recall_floor_met",
)
def q_emb_knn_ivf_recall(spark, sf_dir):
    """Pooled-recall gate for IVF knn: recall@5 pooled over the 8
    queries must clear 0.5 (pytest floor 0.6 minus margin for k-means
    tie-order sensitivity). Green iff the floor holds on the driver."""
    rec = _knn_hits(spark, sf_dir, similarity.ivf_topk)
    return rec.agg(
        F.count(F.lit(1)).alias("n_queries"),
        (F.avg("recall") >= 0.5).alias("recall_floor_met"),
    )


@register(
    "emb_knn_ivf_incremental",
    oracle="SELECT 8 AS n_queries, TRUE AS assignment_ok, "
           "TRUE AS recall_floor_met",
)
def q_emb_knn_ivf_incremental(spark, sf_dir):
    """Incremental IVF maintenance gate (similarity.ivf_insert): the
    on-disk index is BUILT from the even vec_ids only, the odd half is
    then INSERTED against the frozen centroids (no corpus re-cluster,
    no reshuffle), and the gate asserts (a) every inserted vector
    landed in its argmax-cosine cell and (b) querying the grown index
    still clears the 0.5 pooled-recall floor vs exact brute force over
    the FULL corpus — proving inserts are first-class index members,
    not second-class stragglers."""
    import os
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    idx = os.path.join(tempfile.mkdtemp(prefix="ivf_incr_"), "index")
    similarity.ivf_write_index(emb.filter(F.col("vec_id") % 2 == 0), idx)
    similarity.ivf_insert(spark, idx, emb.filter(F.col("vec_id") % 2 == 1))

    # (a) inserted rows sit in their argmax-cosine cell
    cells = spark.read.parquet(f"{idx}/cells").filter(
        F.col("neighbor_id") % 2 == 1
    )
    centroids = spark.read.parquet(f"{idx}/centroids")
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("neighbor_id").orderBy(
        F.desc("sim"), F.asc("centroid_id")
    )
    best = (
        cells.select("neighbor_id", "c_vec")
        .crossJoin(F.broadcast(centroids))
        .withColumn("sim", similarity.cosine(F.col("c_vec"), F.col("centroid")))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("neighbor_id", F.col("centroid_id").alias("best_cell"))
    )
    mismatches = (
        cells.select("neighbor_id", "centroid_id")
        .join(best, "neighbor_id")
        .filter(F.col("centroid_id") != F.col("best_cell"))
        .count()
    )

    # (b) pooled recall of the grown index vs exact brute force
    q = emb.filter(F.col("vec_id") < 8)
    bf = similarity.brute_force_topk(emb, q, k=5).select(
        "query_id", "neighbor_id"
    )
    ap = similarity.ivf_topk_indexed(spark, idx, q, k=5).select(
        "query_id", "neighbor_id"
    )
    hits = bf.join(ap, ["query_id", "neighbor_id"]).count()
    n_queries = bf.select("query_id").distinct().count()
    pooled = hits / (5.0 * n_queries) if n_queries else 0.0
    return spark.createDataFrame(
        [(n_queries, mismatches == 0, pooled >= 0.5)],
        "n_queries long, assignment_ok boolean, recall_floor_met boolean",
    )


@register(
    "emb_neardup",
    oracle="""
    SELECT vec_id AS id_a, vec_id + 10000 AS id_b,
           CAST(1.0 AS DOUBLE) AS cosine
    FROM embeddings WHERE vec_id < 50
    """,
)
def q_emb_neardup(spark, sf_dir):
    """Embedding near-dup via the LSH SCALE path (bucketed hyperplane
    self-join + skew cap — no O(n²) theta join; VERDICT r1 item 4).

    The synthetic embeddings have no natural pairs above cosine 0.6,
    so the entry plants 50 exact-duplicate vectors (new ids +10000)
    and runs lsh_cosine_neardup_pairs at threshold 0.95. Identical
    vectors share every bucket in every table, so recall on the
    planted pairs is structurally 1.0 — the oracle can therefore
    assert the full value set, keeping a ★ row while exercising the
    production path end to end."""
    emb = _t(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(copies)
    pairs = similarity.lsh_cosine_neardup_pairs(corpus, threshold=0.95)
    return pairs.withColumn("cosine", F.round("cosine", 6))


@register(
    "emb_neardup_exact",
    oracle=f"""
    WITH q AS (SELECT vec_id AS id_a, embedding AS qv FROM embeddings),
    c AS (SELECT vec_id AS id_b, embedding AS cv FROM embeddings)
    SELECT id_a, id_b,
           {_KNN_DOT} / ({_KNN_NQ} * {_KNN_NC}) AS cosine
    FROM q, c
    WHERE id_a < id_b
      AND {_KNN_DOT} / ({_KNN_NQ} * {_KNN_NC}) >= 0.4
    """.replace("q.qv", "qv").replace("c.cv", "cv"),
)
def q_emb_neardup_exact(spark, sf_dir):
    """Exact embedding-cosine pairs — the brute-force REFERENCE
    implementation (O(n²); oracle/small-N verification only, never
    the scale path — that is emb_neardup's bucketed LSH)."""
    return dedup.embedding_neardup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


@register(
    "multimodal_bytes",
    oracle="""
    SELECT doc_id AS media_id,
           'application/octet-stream' AS mime_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           source
    FROM documents
    """,
)
def q_multimodal_bytes(spark, sf_dir):
    """Multimodal binary-column plumbing: typed payload + metadata."""
    return multimodal.attach_binary_payload(_t(spark, sf_dir, "documents")).drop(
        "payload"
    )


@register("multimodal_features")
def q_multimodal_features(spark, sf_dir):
    """Feature-extract pass (payload -> array<float>) — output shape
    feeds the similarity operators directly. Rows-only (deterministic
    fake encoder for text bytes); the REAL feature path is
    driver-gated by multimodal_features_real."""
    media = multimodal.attach_binary_payload(_t(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media, dim=16)
    return feats.select(
        "media_id", F.size("features").alias("dim")
    ).orderBy("media_id")


@register(
    "multimodal_video_frames",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(range(0, CAST(3 + doc_id % 5 AS BIGINT), 2)) AS INTEGER)
             AS frame_index
    FROM documents WHERE doc_id < 60
    """,
)
def q_multimodal_video_frames(spark, sf_dir):
    """REAL video frame sampling, driver-verified: synthesize Y4M
    containers with n_frames = 3 + doc_id % 5 (operators/codecs
    encode_y4m), then frame_sample_plan counts frames by actually
    parsing the container. The oracle recomputes the sampled indices
    arithmetically, so a container-parse regression breaks the hash."""
    media = multimodal.synthesize_video(_t(spark, sf_dir, "documents"))
    return multimodal.frame_sample_plan(media, every_n=2)


@register(
    "multimodal_features_real",
    oracle="""
    SELECT doc_id AS media_id, 16 AS dim, TRUE AS histogram_normalized
    FROM documents
    """,
)
def q_multimodal_features_real(spark, sf_dir):
    """REAL feature extraction over the synthesized BMP/PPM/WAV corpus:
    intensity/amplitude histograms computed from actually-decoded
    pixels/samples. Driver-gated invariant: every vector has the
    requested dimension and sums to 1 (a codec or histogram
    regression breaks it)."""
    media = multimodal.synthesize_media(_t(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media, dim=16, fake=False)
    total = F.aggregate(
        "features", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return feats.select(
        "media_id",
        F.size("features").alias("dim"),
        (F.abs(total - 1.0) < 1e-5).alias("histogram_normalized"),
    )


@register("multimodal_decode")
def q_multimodal_decode(spark, sf_dir):
    """Arrow-batched mapInPandas decode pass over binary payloads
    (text bytes -> deterministic fake dims; real formats decode for
    real — see multimodal_decode_real)."""
    media = multimodal.attach_binary_payload(_t(spark, sf_dir, "documents"))
    return multimodal.decode_media(media, fake=True)


@register(
    "multimodal_decode_real",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm' ELSE 'wav' END AS fmt,
           CAST(CASE doc_id % 3 WHEN 0 THEN 16 + doc_id % 16
                                WHEN 1 THEN 12 + doc_id % 10
                                ELSE 256 + doc_id % 100 END AS INTEGER) AS width,
           CAST(CASE doc_id % 3 WHEN 0 THEN 8 + doc_id % 8
                                WHEN 1 THEN 6 + doc_id % 6
                                ELSE 1 END AS INTEGER) AS height,
           CAST(CASE doc_id % 3 WHEN 2 THEN 1 ELSE 3 END AS INTEGER) AS channels
    FROM documents
    """,
)
def q_multimodal_decode_real(spark, sf_dir):
    """REAL media decode, driver-verified: synthesize a mixed
    BMP/PPM/WAV corpus whose dimensions are pure functions of doc_id
    (operators/multimodal.synthesize_media), then decode the actual
    bytes with the pure-numpy codecs (operators/codecs.py — no
    imaging libs needed for these formats). The oracle recomputes the
    expected dimensions arithmetically, so a codec regression in
    either the encoder or the decoder breaks the hash."""
    media = multimodal.synthesize_media(_t(spark, sf_dir, "documents"))
    decoded = multimodal.decode_media(media, fake=False)
    return decoded.select("media_id", "fmt", "width", "height", "channels")


@register(
    "multimodal_phash_neardup",
    oracle="""
    SELECT doc_id AS id_a, doc_id + 100000 AS id_b, 0 AS hamming
    FROM documents WHERE doc_id < 100
    """,
)
def q_multimodal_phash_neardup(spark, sf_dir):
    """Image near-duplicate detection via 64-bit difference hashing
    (multimodal.dhash64 + phash_near_pairs): a deterministic
    pseudorandom BMP corpus (one distinct image per doc,
    synthesize_noise_images) is REALLY encoded and decoded, 100
    byte-exact copies are planted (ids +100000), and every planted
    pair MUST surface at hamming 0 through the 16-bit-chunk pigeonhole
    banding — structurally (identical bytes -> identical integer-only
    luma/downsample/bits -> equal chunks), not by luck. The entry
    returns only the planted slice so the oracle asserts the full
    value set; a codec, hashing, or banding regression loses rows."""
    from ai_fabric_etl_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = multimodal.synthesize_noise_images(docs)
    # synthesize the copies from the FILTERED doc slice (same SHA
    # stream, byte-identical payloads): filtering media post-synth
    # cannot push below mapInPandas, so it re-synthesized the whole
    # corpus to keep 100 rows (r10 fix)
    copies = multimodal.synthesize_noise_images(
        docs.filter(F.col("doc_id") < 100)
    ).select(
        (F.col("media_id") + 100000).alias("media_id"),
        "payload", "mime_type", "n_bytes", "source",
    )
    hashes = multimodal.dhash64(media.unionByName(copies), fake=False)
    pairs = multimodal.phash_near_pairs(hashes, max_hamming=3)
    return pairs.filter(
        (F.col("id_b") == F.col("id_a") + 100000) & (F.col("id_a") < 100)
    ).select("id_a", "id_b", "hamming")


@register(
    "multimodal_audiofp_neardup",
    oracle="""
    SELECT doc_id AS id_a, doc_id + 100000 AS id_b, 0 AS hamming
    FROM documents WHERE doc_id < 100
    """,
)
def q_multimodal_audiofp_neardup(spark, sf_dir):
    """Audio near-duplicate detection via 64-bit energy-trend
    fingerprints (multimodal.audio_fp64 + phash_near_pairs): a
    deterministic pseudorandom PCM corpus (one distinct WAV per doc)
    is REALLY encoded and decoded through the stdlib RIFF codec, 100
    byte-exact copies are planted (ids +100000), and every planted
    pair MUST surface at hamming 0 through the same 16-bit-chunk
    pigeonhole banding as the image gate — completing the near-dup
    modality pair (image dHash / audio energy hash) over real
    bytes."""
    from ai_fabric_etl_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = multimodal.synthesize_noise_audio(docs, n_frames=2048)
    copies = multimodal.synthesize_noise_audio(
        docs.filter(F.col("doc_id") < 100), n_frames=2048
    ).select(
        (F.col("media_id") + 100000).alias("media_id"),
        "payload", "mime_type", "n_bytes", "source",
    )
    fps = multimodal.audio_fp64(media.unionByName(copies), fake=False)
    pairs = multimodal.phash_near_pairs(
        fps, max_hamming=3, hash_col="afp"
    )
    return pairs.filter(
        (F.col("id_b") == F.col("id_a") + 100000) & (F.col("id_a") < 100)
    ).select("id_a", "id_b", "hamming")


@register(
    "multimodal_video_neardup",
    oracle="""
    SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
           CAST(3 + doc_id % 5 AS BIGINT) AS n_matching_frames,
           CAST(0 AS INTEGER) AS shift
    FROM documents WHERE doc_id < 30
    """,
)
def q_multimodal_video_neardup(spark, sf_dir):
    """Video near-duplicate detection (multimodal.video_frame_hashes
    + video_near_pairs): the deterministic Y4M corpus (16x8 luma,
    n_frames = 3 + id % 5) is REALLY decoded frame-by-frame, each
    frame dHashes, and 30 byte-exact copies are planted — every
    planted pair MUST surface with n_matching_frames equal to its
    video's exact frame count, at best shift 0 (all frames at
    hamming 0 through the per-frame-index chunk banding; the r10
    shift window [-2, +2] makes head-trimmed/re-cut clips match too,
    and a byte-exact copy must win at offset 0 — the oracle pins
    both the count AND the reported shift). Completes the near-dup
    modality triple: image dHash, audio energy hash, video
    frame-hash alignment — all over real bytes, no imaging/av
    libraries."""
    from ai_fabric_etl_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = multimodal.synthesize_video(docs, max_docs=60)
    copies = multimodal.synthesize_video(
        docs.filter(F.col("doc_id") < 30), max_docs=60
    ).select(
        (F.col("media_id") + 100000).alias("media_id"),
        "payload", "mime_type", "n_bytes", "source",
    )
    fh = multimodal.video_frame_hashes(
        media.unionByName(copies), every_n=1, fake=False
    )
    pairs = multimodal.video_near_pairs(
        fh, max_hamming=3, min_frames=2, max_shift=2
    )
    return pairs.filter(
        (F.col("id_b") == F.col("id_a") + 100000) & (F.col("id_a") < 30)
    ).select("id_a", "id_b", "n_matching_frames", "shift")


@register(
    "multimodal_phash_incremental",
    oracle="""
    SELECT doc_id + 200000 AS batch_id, doc_id AS index_id, 0 AS hamming
    FROM documents WHERE doc_id < 40
    """,
)
def q_multimodal_phash_incremental(spark, sf_dir):
    """INCREMENTAL image near-dup against a persisted fingerprint
    index (multimodal.phash_index_write/probe — the image sibling of
    the MinHash and embedding-LSH incremental paths): the corpus's
    dHashes persist ONCE, partitioned by (chunk, chunk-value bucket);
    a new batch hashes only itself and its chunk keys broadcast
    against the pruned index scan — O(batch) admission, the corpus is
    never re-hashed or re-scanned. The batch is 40 byte-exact copies
    of corpus images (ids +200000) plus 20 NOVEL images (ids +300000,
    in their own 'novel:' SHA stream namespace so a planted id can
    never alias a real corpus stream at any scale factor); the entry
    returns the probe's ENTIRE output, so the oracle asserts both
    full planted recall (every copy at hamming 0) and zero false
    admissions from the novel images. Whole-vs-grown index parity,
    insert visibility, and the static-pruning proof (untouched
    partitions corrupted, probe stays green) are pytest-gated."""
    from ai_fabric_etl_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    # n_buckets=64 — the claimed 100 TB pruning knob, now exercised
    # at bench scale too (r10): the probe's STATIC partition filter
    # reads only the batch's touched (ci, cb) dirs, so finer
    # bucketing costs the write 256 dirs but the probe nothing.
    # The fixture index PERSISTS across runs under a staleness key
    # (r11 bench hygiene: the operator this row measures is the
    # PROBE — the corpus indexes once in any real deployment, and a
    # fresh rebuild per bench run recorded the build, not the
    # operator). A corpus-size or knob change rebuilds.
    idx = _fixture_phash_index(spark, sf_dir)
    copies = multimodal.synthesize_noise_images(
        docs.filter(F.col("doc_id") < 40)
    ).select(
        (F.col("media_id") + 200000).alias("media_id"),
        "payload", "mime_type", "n_bytes", "source",
    )
    novel = multimodal.synthesize_noise_images(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 300000).alias("doc_id")
        ),
        key_prefix="novel:",
    )
    batch = multimodal.dhash64(copies.unionByName(novel), fake=False)
    return multimodal.phash_index_probe(
        spark, idx, batch, max_hamming=3
    ).orderBy("batch_id")


_DECONTAM_SH5 = (
    "CASE WHEN len(t) >= 5 THEN list_distinct(list_transform(range(1, len(t)-3), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) "
    "ELSE [array_to_string(t, ' ')] END"
)


@register(
    "text_decontaminate",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
    sh AS (SELECT doc_id, {_DECONTAM_SH5} AS s FROM tok),
    bench AS (SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id % 83 = 0),
    doc_grams AS (SELECT doc_id, unnest(s) AS gram FROM sh)
    SELECT d.doc_id, COUNT(DISTINCT d.gram) AS n_overlap
    FROM doc_grams d JOIN bench b ON d.gram = b.gram
    GROUP BY d.doc_id
    """,
)
def q_text_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag every training doc sharing a
    word 5-gram with the benchmark slice (doc_id % 83 == 0 stands in
    for a held-out eval set; the corpus's planted duplicates guarantee
    real cross-doc leakage to catch). Spark joins xxhash64-hashed
    shingles against the broadcast benchmark set; the oracle replays
    it with string n-grams — identical modulo 64-bit collisions."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 83 == 0)
    return dedup.contamination_overlap(docs, bench, n=5)


@register(
    "text_repetition",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
    base AS (
      SELECT doc_id, len(t) AS n_tokens,
             greatest(len(t) - 2, 1) AS n_ngrams,
             CASE WHEN len(t) >= 3 THEN len(list_distinct(list_transform(range(1, len(t)-1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
                  ELSE 1 END AS n_distinct_ngrams,
             t
      FROM tok),
    tw AS (
      SELECT doc_id, MAX(cnt) AS top_word_count FROM (
        SELECT doc_id, tok, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(t) AS tok FROM tok)
        GROUP BY doc_id, tok)
      GROUP BY doc_id)
    SELECT b.doc_id, b.n_tokens, b.n_ngrams, b.n_distinct_ngrams,
           ROUND(1.0 - b.n_distinct_ngrams / b.n_ngrams, 6) AS dup_ngram_frac,
           tw.top_word_count,
           ROUND(tw.top_word_count / b.n_tokens, 6) AS top_word_share
    FROM base b JOIN tw USING (doc_id)
    """,
)
def q_text_repetition(spark, sf_dir):
    """Within-doc repetition signals (duplicate n-gram fraction, top
    word share) — the Gopher-style degenerate-text filters."""
    from ai_fabric_etl_spark.operators.text import repetition_profile

    return repetition_profile(_t(spark, sf_dir, "documents"), n=3)


@register(
    "emb_kmeans_invariant",
    oracle="""
    SELECT COUNT(*) AS n_points, 8 AS k_clusters, 0 AS n_violations
    FROM embeddings
    """,
)
def q_emb_kmeans_invariant(spark, sf_dir):
    """Cosine k-means corpus clustering with a checkable optimality
    invariant: every point's assigned centroid must be its argmax-
    cosine centroid (within 1e-6 for ties) — a wrong assignment or a
    non-normalized centroid breaks the count. Cluster ids themselves
    are seed-dependent, so the driver-stable contract is the
    invariant, not the labeling."""
    emb = _t(spark, sf_dir, "embeddings")
    assigned, centroids = similarity.kmeans_clusters(emb, k=8)
    best = (
        emb.select(F.col("vec_id"), F.col("embedding"))
        .crossJoin(F.broadcast(centroids))
        .withColumn("sim", similarity.cosine(F.col("embedding"), F.col("centroid")))
        .groupBy("vec_id")
        .agg(F.max("sim").alias("best_sim"))
    )
    return (
        assigned.join(best, "vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.lit(8).alias("k_clusters"),
            F.sum(
                F.when(
                    F.col("best_sim") - F.col("centroid_sim") > 1e-6, 1
                ).otherwise(0)
            ).alias("n_violations"),
        )
    )


@register(
    "text_quality_filter",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
    rep AS (
      SELECT doc_id, len(t) AS n_tokens,
             greatest(len(t) - 2, 1) AS n_ngrams,
             CASE WHEN len(t) >= 3 THEN len(list_distinct(list_transform(range(1, len(t)-1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
                  ELSE 1 END AS n_distinct_ngrams,
             list_aggregate(list_transform(t, x -> length(x)), 'sum') AS char_sum,
             len(list_filter(t, x -> list_contains(['the','a','of','and','to'], x)))
               AS stop_hits
      FROM tok),
    tw AS (
      SELECT doc_id, MAX(cnt) AS top_word_count FROM (
        SELECT doc_id, tok, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(t) AS tok FROM tok)
        GROUP BY doc_id, tok)
      GROUP BY doc_id),
    sig AS (
      SELECT r.doc_id, r.n_tokens,
             ROUND(r.char_sum / r.n_tokens, 6) AS mean_word_len,
             ROUND(r.stop_hits / r.n_tokens, 6) AS stop_frac,
             ROUND(tw.top_word_count / r.n_tokens, 6) AS top_word_share,
             ROUND(1.0 - r.n_distinct_ngrams / r.n_ngrams, 6) AS dup_ngram_frac
      FROM rep r JOIN tw USING (doc_id))
    SELECT doc_id, n_tokens, mean_word_len, stop_frac, top_word_share,
           dup_ngram_frac,
           n_tokens BETWEEN 30 AND 100000 AS wc_ok,
           mean_word_len BETWEEN 3.0 AND 5.0 AS mwl_ok,
           stop_frac >= 0.02 AS stop_ok,
           top_word_share <= 0.15 AS rep_ok,
           dup_ngram_frac <= 0.1 AS dup_ok,
           (n_tokens BETWEEN 30 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 5.0)
             AND stop_frac >= 0.02 AND top_word_share <= 0.15
             AND dup_ngram_frac <= 0.1 AS keep
    FROM sig
    """,
)
def q_text_quality_filter(spark, sf_dir):
    """C4/Gopher composite quality gate: five named rules, per-rule
    flags plus the conjunction — the standard pre-training corpus
    filter, one doc_id-keyed shuffle total."""
    from ai_fabric_etl_spark.operators.text import quality_filter

    return quality_filter(_t(spark, sf_dir, "documents"))


from ai_fabric_etl_spark.operators.search import (  # noqa: E402
    bm25_topk,
    bm25_topk_sql,
    term_stats,
)

_BM25_QUERY = "vector hash stream"


@register(
    "search_bm25_topk",
    oracle=bm25_topk_sql(_BM25_QUERY, k=20),
)
def q_search_bm25_topk(spark, sf_dir):
    """BM25 corpus search: top-20 documents for a three-term query.
    Explode → broadcast-term filter → one tf shuffle → broadcast df/
    corpus-stats joins → TakeOrdered; the oracle replays the identical
    tokenizer, idf, and length normalization in SQL. Fills the search
    hole in the reference's text surface (P11 is substring/regex
    only)."""
    return bm25_topk(_t(spark, sf_dir, "documents"), _BM25_QUERY, k=20)


from ai_fabric_etl_spark.operators.search import (  # noqa: E402
    hybrid_rrf_topk,
    hybrid_rrf_topk_sql,
)

_RRF_VEC_ID = 3


@register(
    "search_hybrid_rrf",
    oracle=hybrid_rrf_topk_sql(_BM25_QUERY, _RRF_VEC_ID, k=15, k_each=20),
)
def q_search_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval (operators/search.hybrid_rrf_topk): BM25
    top-20 and exact-cosine top-20 candidate lists fused by
    reciprocal rank (1/(60+rank), Cormack et al.) into one top-15 —
    the standard two-tower corpus-curation/RAG retrieval shape. Both
    candidate plans are independently optimized top-k reductions; the
    fusion is a broadcast full-outer join of two <=20-row frames, so
    swapping the ANN side to the IVF/LSH index path changes recall,
    not the fusion plan."""
    return hybrid_rrf_topk(
        _t(spark, sf_dir, "documents"),
        _t(spark, sf_dir, "embeddings"),
        _BM25_QUERY,
        query_vec_id=_RRF_VEC_ID,
        k=15,
        k_each=20,
    )


from ai_fabric_etl_spark.operators.search import (  # noqa: E402
    mmr_rerank,
    mmr_rerank_sql,
)


@register(
    "search_mmr_rerank",
    oracle=mmr_rerank_sql(_RRF_VEC_ID, k=8, k_cand=20),
)
def q_search_mmr_rerank(spark, sf_dir):
    """MMR diversity re-ranking (operators/search.mmr_rerank,
    Carbonell & Goldstein SIGIR'98): the exact-cosine top-20
    candidates for query vector 3 greedily re-rank to 8 results
    maximizing 0.7*relevance - 0.3*max-similarity-to-selected — the
    standard pass between retrieval and a RAG context window that
    stops near-duplicate passages crowding out coverage. Full value
    oracle: the greedy selection unrolls as 8 chained argmax CTEs in
    DuckDB over the SAME fixed-order cosine doubles, so selection
    order, ranks, and 6-dp scores must match bit-for-bit."""
    return mmr_rerank(
        _t(spark, sf_dir, "embeddings"),
        query_vec_id=_RRF_VEC_ID,
        k=8,
        k_cand=20,
    )


_TERM_STATS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS term
  FROM documents
),
per_doc AS (
  SELECT doc_id, term, COUNT(*) AS tf_doc FROM toks GROUP BY doc_id, term
),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
SELECT term, COUNT(*) AS df, CAST(SUM(tf_doc) AS BIGINT) AS total_tf,
       ROUND(ln(1.0 + (n.n_docs - COUNT(*) + 0.5) / (COUNT(*) + 0.5)), 6)
         AS idf
FROM per_doc CROSS JOIN n
GROUP BY term, n.n_docs
HAVING COUNT(*) >= 5
"""


@register("search_term_stats", oracle=_TERM_STATS_ORACLE)
def q_search_term_stats(spark, sf_dir):
    """Corpus vocabulary statistics (df / total tf / idf, min_df=5):
    the build side of an inverted index or keyword-curation pass —
    one explode, two-level aggregate, broadcast scalar."""
    return term_stats(_t(spark, sf_dir, "documents"), min_df=5)


_EDITDIST_ORACLE = """
WITH names AS (
  SELECT MIN(p_partkey) AS doc_id, p_name AS text FROM part GROUP BY p_name
),
off AS (SELECT MAX(doc_id) + 1 AS o FROM names),
corpus AS (
  SELECT doc_id, text FROM names
  UNION ALL
  SELECT doc_id + o,
         substring(text, 1, 4) || substring(text, 6)
  FROM names CROSS JOIN off WHERE doc_id % 3 <> 2
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.text, b.text) AS INT) AS dist
FROM corpus a
JOIN corpus b
  ON a.doc_id < b.doc_id
 AND abs(length(a.text) - length(b.text)) <= 1
WHERE levenshtein(a.text, b.text) <= 1
"""


@register("dedup_editdistance", oracle=_EDITDIST_ORACLE)
def q_dedup_editdistance(spark, sf_dir):
    """Exact Levenshtein-≤1 self-join over the DISTINCT part-name
    vocabulary with planted one-character-deletion typos: the SymSpell
    deletion-neighborhood join must recover every planted
    (original, typo) pair plus any naturally-close name pair —
    verified against a brute-force levenshtein oracle (exact, not
    recall-based). Distinct-first is the scale-correct shape: exact
    duplicates collapse via hash dedup BEFORE the quadratic-prone
    near-join (a value repeated m times would otherwise contribute m²
    candidate pairs), so the neighborhood join runs on vocabulary
    size, not corpus size. The engine never materializes the O(n²)
    pair space; the oracle does, which is exactly why it can't be the
    engine plan at 100 TB."""
    names = (
        _t(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("text"))
        .agg(F.min("p_partkey").alias("doc_id"))
    )
    # offset derived from the data — a fixed literal collides with
    # base ids once p_partkey outgrows it (TPC-H SF > 50)
    off = names.agg((F.max("doc_id") + 1).alias("_off"))
    typos = (
        names.crossJoin(F.broadcast(off))
        .filter(F.col("doc_id") % 3 != 2)
        .select(
            (F.col("doc_id") + F.col("_off")).alias("doc_id"),
            F.concat(
                F.substring("text", 1, 4), F.expr("substring(text, 6)")
            ).alias("text"),
        )
    )
    return dedup.edit_distance_pairs(
        names.select("doc_id", "text").unionByName(typos),
        id_col="doc_id",
        text_col="text",
        max_dist=1,
    )


_BIGRAM_MIN = 30
_BIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents
),
bigrams AS (
  SELECT doc_id,
         unnest(list_transform(list_zip(t[1:len(t)-1], t[2:len(t)]),
                               p -> p[1] || ' ' || p[2])) AS bigram
  FROM toks
)
SELECT bigram,
       COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs
FROM bigrams
GROUP BY bigram
HAVING COUNT(*) >= {_BIGRAM_MIN}
"""


@register("text_top_bigrams", oracle=_BIGRAM_ORACLE)
def q_text_top_bigrams(spark, sf_dir):
    """Corpus bigram statistics (the n-gram frequency table LM data
    work reads constantly): adjacent-token pairs built expression-
    side (arrays_zip of the token array against its own shift — no
    UDF, no self-join), exploded once, aggregated with a HAVING
    floor so only corpus-level-frequent bigrams survive the shuffle's
    final stage."""
    from ai_fabric_etl_spark.operators.search import tokenize

    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", tokenize(F.col("text")).alias("t")
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(arrays_zip(slice(t, 1, greatest(size(t)-1, 0)), "
                "slice(t, 2, greatest(size(t)-1, 0))), "
                "p -> concat(p['0'], ' ', p['1']))"
            )
        ).alias("bigram"),
    )
    return (
        bigrams.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= _BIGRAM_MIN)
    )


_CHUNK_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tok FROM documents
),
s AS (
  SELECT doc_id, tok,
         unnest(generate_series(1, greatest(len(tok) - 16, 1), 48)) AS strt
  FROM t
)
SELECT doc_id,
       CAST((strt - 1) / 48 AS INTEGER) AS chunk_id,
       len(tok[strt:strt + 63]) AS n_chunk_tokens,
       array_to_string(tok[strt:strt + 63], ' ') AS chunk_text
FROM s
"""


@register("text_chunk_windows", oracle=_CHUNK_ORACLE)
def q_text_chunk_windows(spark, sf_dir):
    """Overlapping token-window chunking (64-token windows, 16-token
    overlap — the RAG/pretraining document splitter): window starts
    from one sequence(), each chunk one slice+array_join inside a
    single codegen projection; the oracle replays the identical
    windows with list slicing. Tail windows keep their remainder;
    every token of every document lands in at least one chunk."""
    from ai_fabric_etl_spark.operators.text import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"),
        chunk_tokens=64,
        overlap=16,
    )


_QUANT_ORACLE = """
WITH base AS (
  SELECT vec_id, label, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
  FROM embeddings
)
SELECT vec_id, label,
       CASE WHEN amax = 0 THEN list_transform(embedding, x -> 0)
            ELSE list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) / (amax / 127.0)) AS INTEGER))
       END AS qvec,
       CAST(amax / 127.0 AS FLOAT) AS qvec_scale
FROM base
"""


@register("emb_quantize_int8", oracle=_QUANT_ORACLE)
def q_emb_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding table
    (scale = max|x|/127): the storage/bandwidth reduction pass in
    front of a sharded ANN index, value-oracled element-for-element —
    float→double promotion is exact in both engines, so the scale and
    every rounded component must match bit-for-bit."""
    from ai_fabric_etl_spark.operators.similarity import quantize_int8

    return quantize_int8(
        _t(spark, sf_dir, "embeddings"), col="embedding"
    ).select("vec_id", "label", "qvec", "qvec_scale")


_CURATE_CHUNKS_ORACLE = f"""
WITH t AS (
  SELECT d.doc_id, d.lang,
         string_split_regex(trim(d.text), '\\s+') AS tok
  FROM documents d
),
s AS (
  SELECT doc_id, lang, tok,
         unnest(generate_series(1, greatest(len(tok) - 16, 1), 48)) AS strt
  FROM t
),
chunks AS (
  SELECT doc_id, lang,
         CAST((strt - 1) / 48 AS INTEGER) AS chunk_id,
         len(tok[strt:strt + 63]) AS n_chunk_tokens,
         array_to_string(tok[strt:strt + 63], ' ') AS chunk_text
  FROM s
),
-- exact chunk dedup: keep the lowest (doc_id, chunk_id) per content
deduped AS (
  SELECT * FROM chunks
  QUALIFY row_number() OVER (
    PARTITION BY md5(chunk_text) ORDER BY doc_id, chunk_id
  ) = 1
),
-- token-weighted sample: 50 chunks per language by exponential race
sampled AS (
  SELECT doc_id, chunk_id, lang, n_chunk_tokens FROM deduped
  WHERE n_chunk_tokens > 0
  QUALIFY row_number() OVER (
    PARTITION BY lang
    ORDER BY -ln((('0x' || substr(md5(COALESCE(CAST(doc_id * 1000 + chunk_id
        AS VARCHAR), '__NULL__') || '-chsample'), 1, 8))::BIGINT + 1)
        / {16 ** 8 + 1!r}) / CAST(n_chunk_tokens AS DOUBLE),
      doc_id * 1000 + chunk_id
  ) <= 50
)
SELECT lang,
       COUNT(*) AS n_chunks,
       CAST(SUM(n_chunk_tokens) AS BIGINT) AS tokens_total,
       COUNT(DISTINCT doc_id) AS n_docs
FROM sampled
GROUP BY lang
"""


@register("curate_chunks_pipeline", oracle=_CURATE_CHUNKS_ORACLE)
def q_curate_chunks_pipeline(spark, sf_dir):
    """End-to-end chunk-level curation composing this round's
    operators: chunk_documents (64/16 windows) → exact chunk dedup
    (hash-groupBy on content, lowest (doc, chunk) canonical) →
    token-WEIGHTED sampling (50 chunks per language via the
    deterministic exponential race, long chunks proportionally
    likelier) → per-language token accounting. Every stage is
    deterministic, so the oracle replays the whole pipeline
    relationally — the composition IS the test."""
    from ai_fabric_etl_spark.operators.sampling import weighted_priority_sample
    from ai_fabric_etl_spark.operators.text import chunk_documents
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    chunks = chunk_documents(docs, chunk_tokens=64, overlap=16).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    w = Window.partitionBy(F.md5("chunk_text")).orderBy("doc_id", "chunk_id")
    deduped = (
        chunks.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("n_chunk_tokens") > 0))
        .drop("_rn")
    )
    keyed = deduped.withColumn(
        "chunk_key", F.col("doc_id") * 1000 + F.col("chunk_id")
    )
    sampled = weighted_priority_sample(
        keyed, key="chunk_key", weight_col="n_chunk_tokens", k=50,
        by=["lang"], salt="chsample",
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("tokens_total"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


_POSTINGS_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS term
  FROM documents
),
agg AS (
  SELECT term, list(doc_id ORDER BY doc_id) AS postings,
         COUNT(*) AS df
  FROM toks GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT term, df, postings
FROM agg, n WHERE df >= 5 AND df <= 0.9 * n_docs
"""


@register("search_posting_lists", oracle=_POSTINGS_ORACLE)
def q_search_posting_lists(spark, sf_dir):
    """Inverted-index posting lists (term → sorted doc ids) for the
    useful-frequency band (5 ≤ df ≤ 90% of the corpus — near-
    universal terms stay out of the index, hapaxes aren't worth a
    posting): one explode + distinct + sort-inside-aggregation, the
    band bound riding a broadcast one-row total. With
    search_bm25_topk and search_term_stats this completes the
    search-index build surface."""
    from ai_fabric_etl_spark.operators.search import tokenize

    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("term"))
        .distinct()
    )
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list("doc_id")).alias("postings"),
        )
        .join(F.broadcast(total))
        .filter((F.col("df") >= 5) & (F.col("df") <= 0.9 * F.col("n_docs")))
        .select("term", "df", "postings")
    )


_XDECON_ORACLE = """
WITH bench AS (
  SELECT vec_id, embedding FROM embeddings WHERE label = 0
),
corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE label <> 0
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings
  WHERE label = 0 AND vec_id % 3 = 0
),
scored AS (
  SELECT c.vec_id,
         MAX(
           list_sum(list_transform(list_zip(c.embedding, b.embedding),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / NULLIF(
               sqrt(list_sum(list_transform(c.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(b.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 0)
         ) AS max_sim
  FROM corpus c CROSS JOIN bench b
  GROUP BY c.vec_id
)
SELECT vec_id, ROUND(max_sim, 6) AS max_benchmark_sim
FROM scored WHERE max_sim >= 0.98
"""


@register("emb_cross_decontaminate", oracle=_XDECON_ORACLE)
def q_emb_cross_decontaminate(spark, sf_dir):
    """SEMANTIC decontamination: corpus vectors whose cosine to any
    benchmark vector (label 0 plays the held-out benchmark) reaches
    0.98 — the embedding-space sibling of the n-gram
    text_decontaminate. The benchmark side BROADCASTS (benchmarks are
    always small next to a corpus), so the engine is one map-side
    pass over the corpus — no shuffle, no pair materialization; the
    oracle brute-forces the same cross product, which is exactly what
    a 100 TB engine must never do (the LSH-bucketed variant in
    operators/similarity.py is the scale path when the benchmark side
    grows)."""
    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec")
    )
    # plant leaked benchmark rows in the corpus: every one of them
    # MUST surface at cosine 1.0 (structural recall gate), and the
    # clean corpus must surface nothing at this threshold
    corpus = (
        emb.filter(F.col("label") != 0)
        .select("vec_id", "embedding")
        .unionByName(
            emb.filter((F.col("label") == 0) & (F.col("vec_id") % 3 == 0))
            .select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
        )
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("b_vec"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    sim = dot / F.nullif(norm(F.col("embedding")) * norm(F.col("b_vec")), F.lit(0.0))
    return (
        corpus.join(F.broadcast(bench))
        .select("vec_id", sim.alias("_sim"))
        .groupBy("vec_id")
        .agg(F.max("_sim").alias("max_sim"))
        .filter(F.col("max_sim") >= 0.98)
        .select("vec_id", F.round("max_sim", 6).alias("max_benchmark_sim"))
    )


_TOKEN_IDS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents
),
df AS (
  SELECT term, COUNT(*) AS df FROM (
    SELECT DISTINCT doc_id, unnest(t) AS term FROM toks
  ) GROUP BY term
),
vocab AS (SELECT list(term ORDER BY df DESC, term) AS vt FROM df)
SELECT doc_id,
       list_transform(t[1:64], tok -> list_position(v.vt, tok)) AS token_ids,
       len(t) AS n_tokens
FROM toks CROSS JOIN vocab v
"""


@register("text_token_ids", oracle=_TOKEN_IDS_ORACLE)
def q_text_token_ids(spark, sf_dir):
    """Token-to-id encoding — the train-ready integer export: vocab
    ids ranked by document frequency (ties by term), each document's
    first 64 tokens mapped in position order, out-of-vocabulary → 0.
    Fully distributed: posexplode positions → broadcast vocab join →
    sort-inside-aggregation reassembly; no driver-side vocab
    round-trip, no UDF. The oracle replays the identical ranking via
    an ordered list + list_position.

    Vocabulary ids come from ranking.global_row_number (range shuffle
    + offsets), not a one-task global window: a web-scale corpus's
    term vocabulary runs to tens of millions of rows. The broadcast
    of the finished vocab is the test-scale convenience; at 100 TB
    cap the vocabulary (df floor) or drop the hint and let AQE pick
    the join."""
    from ai_fabric_etl_spark.operators.ranking import global_row_number
    from ai_fabric_etl_spark.operators.search import tokenize

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", tokenize(F.col("text")).alias("t")
    )
    doc_terms = docs.select(
        "doc_id", F.explode(F.array_distinct("t")).alias("term")
    )
    vocab = global_row_number(
        doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("df")),
        [F.col("df").desc(), F.col("term")],
        out_col="id",
    ).select("term", "id")
    pos = docs.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.posexplode(F.slice("t", 1, 64)).alias("pos", "term"),
    )
    return (
        pos.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("pos").alias("pos"),
                            F.coalesce(F.col("id"), F.lit(0)).alias("id"),
                        )
                    )
                ),
                lambda s: s["id"],
            ).alias("token_ids"),
            F.first("n_tokens").alias("n_tokens"),
        )
    )


from ai_fabric_etl_spark.operators.search import (  # noqa: E402
    tfidf_topk_terms,
    tfidf_topk_terms_sql,
)


@register("text_tfidf_topk", oracle=tfidf_topk_terms_sql(k=5, min_df=2))
def q_text_tfidf_topk(spark, sf_dir):
    """Per-document top-5 keywords by tf-idf (min_df=2): the sparse
    document-vector / keyword-extraction export completing the IR
    family (bm25 scores docs per query; this scores terms per doc).
    Ranked on the ROUNDED score so the driver hash can't flip on libm
    ulps; the vocabulary join is deliberately NOT broadcast (see
    operators/search.tfidf_topk_terms scale notes)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_topk_terms(docs, k=5, min_df=2)


_ER_ORACLE = """
WITH RECURSIVE names AS (
  SELECT MIN(p_partkey) AS doc_id, p_name AS text FROM part GROUP BY p_name
),
off AS (SELECT MAX(doc_id) + 1 AS o FROM names),
recs AS (
  SELECT doc_id, text FROM names
  UNION ALL
  SELECT doc_id + o,
         substring(text, 1, 4) || substring(text, 6)
  FROM names CROSS JOIN off WHERE doc_id % 3 <> 2
  UNION ALL
  SELECT doc_id + 2 * o,
         substring(text, 1, 1) || substring(text, 3)
  FROM names CROSS JOIN off WHERE doc_id % 3 = 0
),
pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM recs a JOIN recs b
    ON a.doc_id < b.doc_id
   AND abs(length(a.text) - length(b.text)) <= 1
  WHERE levenshtein(a.text, b.text) <= 1
),
edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
walk(u, comp) AS (
  SELECT doc_id, doc_id FROM recs
  UNION
  SELECT e.u, w.comp FROM edges e JOIN walk w ON e.v = w.u
),
lab AS (SELECT u AS doc_id, MIN(comp) AS entity_id FROM walk GROUP BY u)
SELECT l.entity_id,
       COUNT(*) AS n_records,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_duplicates,
       arg_min(r.text, r.doc_id) AS canonical_text
FROM lab l JOIN recs r USING (doc_id)
GROUP BY l.entity_id
"""


@register("er_resolve_entities", oracle=_ER_ORACLE)
def q_er_resolve_entities(spark, sf_dir):
    """Entity resolution end to end: blocking → match → cluster →
    survivorship. Two deterministic typo classes are planted per part
    name (single deletions at different positions — so the variants
    sit at distance 2 from each other and unify only TRANSITIVELY
    through their original, exercising real cluster formation, not
    just pair matching). The pipeline: SymSpell deletion-neighborhood
    blocking + exact Levenshtein-≤1 verification
    (dedup.edit_distance_pairs — never the O(n²) pair space the
    oracle brute-forces), large-star/small-star connected components
    (O(log n) rounds), then one aggregate electing the golden record
    (min-id survivorship via min_by). Singleton records keep their
    own id as entity_id through the left-join recovery."""
    import os as _os

    from ai_fabric_etl_spark.operators import dedup as _dedup
    from ai_fabric_etl_spark.streaming.admission_common import phase_timer

    # VERDICT r13 item 3: under SPARK_GRAFT_GATE_TIMINGS the entry
    # materializes (and persists) each phase at its boundary so the
    # printout attributes the wall to names / pairs / components —
    # the same diagnosis discipline the paired gate got in r13. The
    # un-instrumented plan is untouched.
    _timing = bool(_os.environ.get("SPARK_GRAFT_GATE_TIMINGS"))
    mark = phase_timer("er")

    # persisted: the base-names aggregate feeds FOUR consumers (the
    # offset scalar, both typo-variant branches, and the recs union) —
    # unpersisted, each re-scans and re-aggregates the part table
    # (r12: the only driver-flagged r11 perf row; the SymSpell block
    # path itself was audited sound, this was the repeated-scan slack)
    names = (
        _t(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("text"))
        .agg(F.min("p_partkey").alias("doc_id"))
    ).persist()
    if _timing:
        names.count()
        mark("names agg (scan+groupBy part)")
    # variant-id offset DERIVED from the data (max key + 1): fixed
    # literal offsets collide with base ids once keys outgrow them
    # (p_partkey passes 1e7 at TPC-H SF 50), silently merging
    # unrelated records
    off = names.agg((F.max("doc_id") + 1).alias("_off"))
    t1 = (
        names.crossJoin(F.broadcast(off))
        .filter(F.col("doc_id") % 3 != 2)
        .select(
            (F.col("doc_id") + F.col("_off")).alias("doc_id"),
            F.concat(
                F.substring("text", 1, 4), F.expr("substring(text, 6)")
            ).alias("text"),
        )
    )
    t2 = (
        names.crossJoin(F.broadcast(off))
        .filter(F.col("doc_id") % 3 == 0)
        .select(
            (F.col("doc_id") + 2 * F.col("_off")).alias("doc_id"),
            F.concat(
                F.substring("text", 1, 1), F.expr("substring(text, 3)")
            ).alias("text"),
        )
    )
    recs = names.select("doc_id", "text").unionByName(t1).unionByName(t2)
    pairs = _dedup.edit_distance_pairs(
        recs, id_col="doc_id", text_col="text", max_dist=1
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    if _timing:
        pairs = pairs.persist()
        pairs.count()
        mark("edit-distance pairs (SymSpell block + verify)")
    comp = _dedup.neardup_components(pairs, algorithm="star").select(
        F.col("doc_id").alias("_cid"), F.col("component")
    )
    if _timing:
        comp = comp.persist()
        comp.count()
        mark("components (star)")
    labeled = recs.join(comp, recs.doc_id == F.col("_cid"), "left").select(
        "doc_id",
        "text",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("entity_id"),
    )
    return labeled.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_records"),
        (F.count(F.lit(1)) - 1).cast("long").alias("n_duplicates"),
        F.min_by("text", "doc_id").alias("canonical_text"),
    )


_ZIPF_TOP = 80
_ZIPF_ORACLE = f"""
WITH toks AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS term
  FROM documents
),
freq AS (
  SELECT lang, term, COUNT(*) AS f FROM toks GROUP BY lang, term
),
ranked AS (
  SELECT lang, term, f,
         row_number() OVER (PARTITION BY lang ORDER BY f DESC, term) AS r
  FROM freq
),
pts AS (
  SELECT lang,
         CAST(ROUND(ln(r) * 1000000) AS BIGINT) AS x,
         CAST(ROUND(ln(f) * 1000000) AS BIGINT) AS y
  FROM ranked WHERE r <= {_ZIPF_TOP}
),
s AS (
  SELECT lang, COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy,
         SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx
  FROM pts GROUP BY lang
)
SELECT lang, CAST(n AS BIGINT) AS n_terms,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope
FROM s WHERE n >= 2
"""


@register("text_zipf_slope", oracle=_ZIPF_ORACLE)
def q_text_zipf_slope(spark, sf_dir):
    """Zipf's-law fit per language: least-squares slope of
    ln(frequency) against ln(rank) over each language's top terms —
    the corpus-health diagnostic (natural text sits near −1; template
    or spam-heavy sources drift off it).

    Cross-engine determinism without decimal-exact logs: each point's
    ln() is quantized to integer micro-units FIRST
    (round(ln·1e6) as BIGINT), then the regression moments are EXACT
    DECIMAL(38,0) sums — the only float op left is one final division,
    rounded to 6 dp on both sides. Order-dependent double summation
    (the usual covar_pop hazard) never occurs.

    Scale: one explode + per-lang frequency aggregate; ranking is a
    per-language window over language vocabularies; the moment
    aggregate collapses to one row per language."""
    from ai_fabric_etl_spark.operators.search import tokenize
    from pyspark.sql.window import Window

    toks = _t(spark, sf_dir, "documents").select(
        "lang", F.explode(tokenize(F.col("text"))).alias("term")
    )
    freq = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("f"))
    r = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.col("f").desc(), F.col("term"))
    )
    pts = (
        freq.withColumn("r", r)
        .filter(F.col("r") <= _ZIPF_TOP)
        .select(
            "lang",
            F.round(F.log(F.col("r")) * 1_000_000)
            .cast("long")
            .alias("x"),
            F.round(F.log(F.col("f")) * 1_000_000)
            .cast("long")
            .alias("y"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = pts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
    )
    return s.filter(F.col("n") >= 2).select(
        "lang",
        F.col("n").cast("long").alias("n_terms"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            ),
            6,
        ).alias("zipf_slope"),
    )


_OVERLAP_ORACLE = f"""
WITH corpus AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'zmirror' AS source, text FROM documents WHERE doc_id % 7 = 0
),
fp AS (
  SELECT DISTINCT source, md5(array_to_string({_TOK}, ' ')) AS fingerprint
  FROM corpus
)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS shared_docs
FROM fp a JOIN fp b
  ON a.fingerprint = b.fingerprint AND a.source < b.source
GROUP BY 1, 2
"""


@register("corpus_overlap_matrix", oracle=_OVERLAP_ORACLE)
def q_corpus_overlap_matrix(spark, sf_dir):
    """Cross-source duplication matrix: for every source pair, how
    many exact-content fingerprints they share — the corpus-forensics
    view that tells you which crawls/dumps are re-scrapes of each
    other BEFORE global dedup destroys the evidence. A 'zmirror'
    source re-publishing every 7th document is planted so the matrix
    provably surfaces each real source's leak into it (the synthetic
    corpus has no natural cross-source dups — an empty result would
    verify nothing). One distinct aggregate + a self-join keyed on
    the fingerprint (pair space bounded by per-fingerprint source
    counts, never |corpus|²)."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.select("source", "text").unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            F.lit("zmirror").alias("source"), "text"
        )
    )
    fp = corpus.select(
        "source",
        F.md5(
            F.concat_ws(
                " ", F.split(F.trim(F.col("text")), r"\s+")
            )
        ).alias("fingerprint"),
    ).distinct()
    a = fp.select(
        F.col("source").alias("source_a"),
        F.col("fingerprint").alias("_fp_a"),
    )
    b = fp.select(
        F.col("source").alias("source_b"),
        F.col("fingerprint").alias("_fp_b"),
    )
    return (
        a.join(
            b,
            (F.col("_fp_a") == F.col("_fp_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_docs"))
    )


def _pq_approx(emb, q, k=5):
    """Shared PQ pipeline, same (corpus, queries, k) shape as the
    lsh/ivf topk functions so _knn_hits can drive it directly:
    L2-normalize both sides (squared-L2 ranking == cosine ranking),
    OPQ-balance the coordinate layout, train m=8/k=64 codebooks,
    encode, ADC shortlist of 200, exact rerank. Parameters sized for
    the sf0.1 corpus (20k vectors): k=16/rerank=50 measured pooled
    recall 0.45 there, k=64/rerank=200 measures 1.0 — shortlist depth
    must track corpus size, exactly as FAISS's nprobe/efSearch do."""
    perm = similarity.opq_permutation(emb, m=8)
    nemb = similarity.apply_permutation(similarity.normalize_l2(emb), perm)
    nq = similarity.apply_permutation(similarity.normalize_l2(q), perm)
    books = similarity.pq_train(nemb, m=8, k=64)
    codes = similarity.pq_encode(nemb, books)
    return similarity.pq_topk(
        codes, books, nq, k=k, rerank=200, corpus=nemb
    )


@register("emb_knn_pq")
def q_emb_knn_pq(spark, sf_dir):
    """Approximate top-5 via PRODUCT QUANTIZATION + exact rerank
    (Jégou et al. TPAMI'11; the FAISS IVFPQ-with-refine shape): the
    corpus scan reads 8 code bytes per vector instead of 256 float
    bytes, the query's m×k ADC lookup table scores candidates with
    table adds, and only the 50-row shortlist per query touches raw
    floats. Rows-only (k-means codebooks are not SQL-replayable);
    recall gated by emb_knn_pq_recall."""
    emb = _t(spark, sf_dir, "embeddings")
    out = _pq_approx(emb, emb.filter(F.col("vec_id") < 8))
    return out.withColumnRenamed("rank", "knn_rank").orderBy(
        "query_id", "knn_rank"
    )


@register(
    "emb_knn_pq_recall",
    oracle="SELECT 8 AS n_queries, TRUE AS recall_floor_met",
)
def q_emb_knn_pq_recall(spark, sf_dir):
    """Driver-visible PQ recall gate: pooled recall@5 of the
    OPQ-permuted ADC-shortlist + exact-rerank pipeline vs cosine
    brute force must hold ≥ 0.6 (measured 1.0 at sf0.01 AND sf0.1
    with m=8/k=64/rerank=200; the pytest floor is 0.7). A
    codebook/encode/ADC/permutation regression flips the driver's
    value hash."""
    rec = _knn_hits(spark, sf_dir, _pq_approx)
    return rec.agg(
        F.count(F.lit(1)).alias("n_queries"),
        (F.avg("recall") >= 0.6).alias("recall_floor_met"),
    )


_PMI_MIN = 20
_PMI_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents
),
uni AS (
  SELECT term, COUNT(*) AS cu FROM (
    SELECT unnest(t) AS term FROM toks
  ) GROUP BY term
),
nu AS (SELECT SUM(cu) AS n_uni FROM uni),
bi AS (
  SELECT w[1] AS w1, w[2] AS w2, COUNT(*) AS cb FROM (
    SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS w FROM toks
  ) GROUP BY 1, 2 HAVING COUNT(*) >= {_PMI_MIN}
),
nb AS (
  SELECT COUNT(*) AS n_bi FROM (
    SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS w FROM toks
  )
)
SELECT b.w1 || ' ' || b.w2 AS bigram, b.cb AS n_occurrences,
       ROUND(ln(
         CAST(CAST(b.cb AS DECIMAL(38,0)) * nu.n_uni * nu.n_uni AS DOUBLE)
         / CAST(CAST(nb.n_bi AS DECIMAL(38,0)) * a.cu * c.cu AS DOUBLE)
       ), 6) AS pmi
FROM bi b
JOIN uni a ON a.term = b.w1
JOIN uni c ON c.term = b.w2
CROSS JOIN nu CROSS JOIN nb
"""


@register("text_pmi_collocations", oracle=_PMI_ORACLE)
def q_text_pmi_collocations(spark, sf_dir):
    """Pointwise mutual information for frequent bigrams — the
    collocation detector (Church & Hanks '90) that separates genuine
    phrases from chance adjacency; LM tokenizer/vocab work reads
    exactly this table to decide merges. The PMI argument
    c_ab·N_uni² / (N_bi·c_a·c_b) is built from EXACT decimal integer
    products; one double division + one ln + ROUND(6) are the only
    float ops on either engine. Unigram joins are vocabulary-sized
    hash joins (not broadcast — same scale note as tf-idf).

    One corpus scan: the tokenized frame is pinned (four consumers —
    unigram counts, their total, bigram counts, their total — would
    otherwise each re-run tokenize+explode over the corpus, and the
    totals derive from the two count aggregates, never a fresh
    scan)."""
    from ai_fabric_etl_spark.operators.search import tokenize

    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", tokenize(F.col("text")).alias("t")
    ).localCheckpoint(eager=False)
    uni = (
        toks.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    n_uni = uni.agg(F.sum("cu").alias("n_uni"))
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(arrays_zip(slice(t, 1, greatest(size(t)-1, 0)), "
                "slice(t, 2, greatest(size(t)-1, 0))), "
                "p -> struct(p['0'] AS w1, p['1'] AS w2))"
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bi_all = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    n_bi = bi_all.agg(F.sum("cb").alias("n_bi"))
    bi = bi_all.filter(F.col("cb") >= _PMI_MIN)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    ua = uni.select(F.col("term").alias("w1"), F.col("cu").alias("cua"))
    uc = uni.select(F.col("term").alias("w2"), F.col("cu").alias("cuc"))
    return (
        bi.join(ua, "w1")
        .join(uc, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("cb").alias("n_occurrences"),
            F.round(
                F.log(
                    (dec("cb") * dec("n_uni") * dec("n_uni")).cast("double")
                    / (dec("n_bi") * dec("cua") * dec("cuc")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


def _jl_oracle() -> str:
    from ai_fabric_etl_spark.operators.similarity import jl_project_sql

    return jl_project_sql("embeddings", "embedding", dim=64, k=16) \
        + " ORDER BY vec_id"


@register("emb_random_projection", oracle=_jl_oracle())
def q_emb_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss ±1 sign projection 64 -> 16 dims
    (similarity.random_project, Achlioptas 2003): the seedless,
    zero-shuffle dimensionality reduction run before ANN/clustering
    when a data-dependent PCA fit is overkill. The sign matrix is an
    md5-derived compile-time literal and every output coordinate an
    explicit fixed-order sum, so DuckDB replays all 16 coordinates of
    every vector bit-for-bit — a FULL value oracle over a "random"
    projection. Distance-preservation quality is pytest-gated
    (pairwise-distance ratios within the JL band on real embeddings)."""
    from ai_fabric_etl_spark.operators.similarity import random_project

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return random_project(
        emb, "embedding", k=16, dim=64, keep=["vec_id"]
    ).orderBy("vec_id")


@register(
    "emb_pca_invariants",
    oracle="""
    SELECT COUNT(*) AS n_points, 8 AS k_components,
           0 AS n_ortho_viol, 0 AS n_order_viol,
           0 AS n_center_viol, 0 AS n_var_viol
    FROM embeddings
    """,
)
def q_emb_pca_invariants(spark, sf_dir):
    """Distributed PCA (similarity.pca_fit/pca_project: one-pass
    moment partials, order-fixed driver fold, d×d eigensolve) with
    checkable optimality invariants — eigenvectors themselves are
    basis/sign-sensitive, so the driver-stable contract is what PCA
    guarantees mathematically: components orthonormal, explained
    variances sorted descending, projected coordinates centered at 0,
    and each coordinate's population variance equal to its
    eigenvalue. Any violation (fit drift, projection bug, partial-
    fold error) breaks a zero. Numerical parity with single-node
    numpy PCA is pytest-gated in test_dedup_similarity.py."""
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings")
    k = 8
    model = similarity.pca_fit(emb, "embedding", k=k)
    W = np.array(model["components"])
    ev = model["explained_var"]
    n_ortho = int((np.abs(W @ W.T - np.eye(k)) > 1e-6).sum())
    n_order = sum(
        1 for a, b in zip(ev, ev[1:]) if b > a + 1e-12
    ) + sum(1 for x in ev if x < 0)
    proj = similarity.pca_project(emb, model, "embedding")
    agg = proj.agg(
        F.count(F.lit(1)).alias("n_points"),
        *[F.avg(F.element_at(F.col("pca"), j + 1)).alias(f"m{j}")
          for j in range(k)],
        *[F.var_pop(F.element_at(F.col("pca"), j + 1)).alias(f"v{j}")
          for j in range(k)],
    ).collect()[0]
    n_center = sum(1 for j in range(k) if abs(agg[f"m{j}"]) > 1e-6)
    n_var = sum(
        1
        for j in range(k)
        if abs(agg[f"v{j}"] - ev[j]) > 1e-6 * max(ev[j], 1e-9)
    )
    return spark.createDataFrame(
        [(int(agg["n_points"]), k, n_ortho, n_order, n_center, n_var)],
        "n_points long, k_components int, n_ortho_viol int, "
        "n_order_viol int, n_center_viol int, n_var_viol int",
    )


@register(
    "dedup_soft_weights",
    oracle="""
    WITH corpus AS (
      SELECT vec_id FROM embeddings
      UNION ALL
      SELECT vec_id + 10000 FROM embeddings WHERE vec_id < 50
    )
    SELECT vec_id AS doc_id,
           CAST(CASE WHEN vec_id >= 10000 THEN vec_id - 10000
                     ELSE vec_id END AS BIGINT) AS cluster_rep,
           CAST(CASE WHEN vec_id < 50 OR vec_id >= 10000
                     THEN 2 ELSE 1 END AS INTEGER) AS cluster_size,
           CAST(CASE WHEN vec_id < 50 OR vec_id >= 10000
                     THEN 500000 ELSE 1000000 END AS BIGINT)
             AS weight_micro
    FROM corpus
    """,
)
def q_dedup_soft_weights(spark, sf_dir):
    """Soft dedup (SlimPajama-style re-weighting instead of dropping):
    the planted-duplicate corpus from emb_neardup runs the full scale
    pipeline — LSH near-dup pairs -> large-star/small-star components
    -> inverse-cluster-size integer micro-weights joined back to every
    document. The planted structure makes the whole output exactly
    predictable: each planted pair forms a 2-cluster (rep = the
    original id, weight 500000); everything else is a singleton at
    weight 1000000. A missed pair, a wrong component, or a weight
    off-by-one flips the value hash."""
    emb = _t(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(copies)
    pairs = similarity.lsh_cosine_neardup_pairs(
        corpus, threshold=0.95
    ).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    return dedup.soft_dedup_weights(
        corpus.select("vec_id"), pairs, id_col="vec_id"
    ).select(
        F.col("vec_id").alias("doc_id"),
        "cluster_rep",
        "cluster_size",
        "weight_micro",
    )


@register(
    "dedup_keep_best",
    oracle="""
    WITH corpus AS (
      SELECT vec_id FROM embeddings
      UNION ALL
      SELECT vec_id + 10000 FROM embeddings WHERE vec_id < 50
    )
    SELECT vec_id AS doc_id,
           CAST(CASE WHEN vec_id >= 10000 THEN vec_id - 10000
                     ELSE vec_id END AS BIGINT) AS cluster_rep,
           CASE WHEN vec_id < 50 THEN
                  (vec_id % 7) > ((vec_id + 10000) % 7)
                WHEN vec_id >= 10000 THEN
                  ((vec_id - 10000) % 7) < (vec_id % 7)
                ELSE TRUE END AS kept,
           CAST(CASE WHEN vec_id < 50 THEN
                  CASE WHEN (vec_id % 7) > ((vec_id + 10000) % 7)
                       THEN vec_id ELSE vec_id + 10000 END
                WHEN vec_id >= 10000 THEN
                  CASE WHEN ((vec_id - 10000) % 7) < (vec_id % 7)
                       THEN vec_id ELSE vec_id - 10000 END
                ELSE vec_id END AS BIGINT) AS canonical_id
    FROM corpus
    """,
)
def q_dedup_keep_best(spark, sf_dir):
    """Quality-argmax hard dedup (dedup.keep_best_per_cluster — the
    RefinedWeb keep-the-BEST-member refinement over min-id keeping):
    the planted-pair corpus from dedup_soft_weights runs LSH pairs ->
    components -> per-cluster quality argmax, with quality the
    arithmetic score id % 7 so the winner of every planted pair is
    exactly predictable on both engines (original scores i % 7, its
    copy (i+10000) % 7 = (i+4) % 7 — never a tie, so roughly half the
    clusters canonicalize on the COPY, which min-id keeping would
    always discard; a min-id regression flips those rows' hashes)."""
    emb = _t(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(copies)
    pairs = similarity.lsh_cosine_neardup_pairs(
        corpus, threshold=0.95
    ).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    scored = corpus.select(
        "vec_id", (F.col("vec_id") % 7).cast("double").alias("q")
    )
    return dedup.keep_best_per_cluster(
        scored, pairs, quality_col="q", id_col="vec_id"
    ).select(
        F.col("vec_id").alias("doc_id"),
        "cluster_rep",
        "kept",
        "canonical_id",
    )


@register(
    "emb_neardup_incremental",
    oracle="""
    SELECT vec_id AS id_a, vec_id + 10000 AS id_b,
           CAST(1.0 AS DOUBLE) AS cosine
    FROM embeddings WHERE vec_id < 50
    UNION ALL
    SELECT vec_id, vec_id + 20000, CAST(1.0 AS DOUBLE)
    FROM embeddings WHERE vec_id < 10
    UNION ALL
    SELECT vec_id + 10000, vec_id + 20000, CAST(1.0 AS DOUBLE)
    FROM embeddings WHERE vec_id < 10
    """,
)
def q_emb_neardup_incremental(spark, sf_dir):
    """Incremental embedding near-dup against a PERSISTED LSH index
    (the embedding sibling of dedup_incremental_planted): the corpus
    is indexed once (keys + vectors + per-bucket occupancy, plane
    count frozen at build); a new batch is admitted in O(batch) — it
    tags itself, merges occupancy deltas for the buckets it touches,
    prunes the index map-side by those base buckets, and verifies
    candidates with exact cosine. The batch plants copies of 50
    corpus vectors (+10000) and RE-copies 10 of them (+20000), so the
    expected pair set is exactly predictable: 50 corpus×batch pairs,
    10 more corpus×batch pairs, and 10 batch-internal pairs — recall
    is structurally 1.0 (identical vectors share every sign bit), and
    the oracle asserts the full 70-pair value set."""
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    idx = tempfile.mkdtemp(prefix="embidx_") + "/idx"
    similarity.emb_neardup_index_write(
        emb.select("vec_id", "embedding"), idx
    )
    batch = (
        emb.filter(F.col("vec_id") < 50)
        .select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
        .unionByName(
            emb.filter(F.col("vec_id") < 10).select(
                (F.col("vec_id") + 20000).alias("vec_id"), "embedding"
            )
        )
    )
    pairs = similarity.emb_neardup_incremental(batch, idx, threshold=0.95)
    return pairs.withColumn("cosine", F.round("cosine", 6))


@register(
    "search_retrieval_metrics",
    oracle="""
    SELECT doc_id AS query_id,
           CAST(3 AS BIGINT) AS n_relevant,
           ROUND(CAST(2 AS DOUBLE) / 3, 6) AS recall_at_k,
           ROUND(1.0 / (doc_id % 3 + 1), 6) AS mrr,
           ROUND(
             CAST(CAST(ROUND(2.0 / log2(CAST(doc_id % 3 + 1 AS DOUBLE)
                                        + 1.0), 6) AS DECIMAL(38,6))
                  + CAST(ROUND(1.0 / log2(6.0), 6) AS DECIMAL(38,6))
               AS DOUBLE)
             / CAST(CAST(ROUND(2.0 / log2(2.0), 6) AS DECIMAL(38,6))
                    + CAST(ROUND(1.0 / log2(3.0), 6) AS DECIMAL(38,6))
                    + CAST(ROUND(1.0 / log2(4.0), 6) AS DECIMAL(38,6))
               AS DOUBLE),
             6) AS ndcg_at_k
    FROM documents WHERE doc_id < 10
    """,
)
def q_search_retrieval_metrics(spark, sf_dir):
    """Retrieval evaluation harness (search.retrieval_metrics —
    recall@k / MRR / nDCG@k with graded relevance): ten synthetic
    queries whose run and judgments are pure arithmetic, so every
    metric value is predictable on both engines. Query q's run is
    docs q*1000+r at ranks r=1..5; its truth is {first relevant at
    rank q%3+1 with grade 2, doc at rank 5 with grade 1, one never-
    retrieved doc with grade 1, PLUS a judged-irrelevant (rel=0) doc
    at rank 4} — so recall@5 = 2/3 for every query, MRR cycles
    1 / 0.5 / 0.333333, and nDCG exercises the graded DCG/IDCG
    decimal-term discipline (each term rounds to 6 dp before the
    exact-decimal sum; the final ratio is one rounded IEEE division).
    The rel=0 row value-gates the graded-qrels fix (ADVICE r10): it
    must count for nothing in n_relevant / recall / MRR — the
    pre-fix code reports n_relevant=4 and recall=0.75 here. The ANN
    recall gates score indexes; this entry value-verifies the METRIC
    math any retrieval run is tuned on."""
    from ai_fabric_etl_spark.operators.search import retrieval_metrics

    q = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 10)
        .select(F.col("doc_id").alias("query_id"))
    )
    results = q.select(
        "query_id",
        F.explode(F.sequence(F.lit(1), F.lit(5))).alias("rank"),
    ).select(
        "query_id",
        (F.col("query_id") * 1000 + F.col("rank")).alias("doc_id"),
        "rank",
    )
    truth = q.select(
        "query_id",
        F.explode(
            F.array(
                F.struct(
                    (F.col("query_id") * 1000 + F.col("query_id") % 3 + 1)
                    .alias("doc_id"),
                    F.lit(2).alias("rel"),
                ),
                F.struct(
                    (F.col("query_id") * 1000 + 5).alias("doc_id"),
                    F.lit(1).alias("rel"),
                ),
                F.struct(
                    (F.col("query_id") * 1000 + 999).alias("doc_id"),
                    F.lit(1).alias("rel"),
                ),
                F.struct(
                    (F.col("query_id") * 1000 + 4).alias("doc_id"),
                    F.lit(0).alias("rel"),
                ),
            )
        ).alias("_t"),
    ).select("query_id", F.col("_t.doc_id").alias("doc_id"),
             F.col("_t.rel").alias("rel"))
    return retrieval_metrics(results, truth, k=5)


@register(
    "audio_admission_gate",
    oracle="""
    SELECT doc_id + 200000 AS media_id, FALSE AS admitted,
           doc_id AS dup_of, 0 AS hamming
    FROM documents WHERE doc_id < 10
    UNION ALL
    SELECT doc_id + 300000, TRUE, NULL, NULL
    FROM documents WHERE doc_id < 10
    UNION ALL
    SELECT doc_id + 400000, FALSE, doc_id + 300000, 0
    FROM documents WHERE doc_id < 10
    """,
)
def q_audio_admission_gate(spark, sf_dir):
    """CONTINUOUS audio admission (streaming/media_admission.
    admit_audio_batch — r11: the audio modality's near-dup goes from
    batch-only to a persisted-index gate, same hash-agnostic trio as
    images): the corpus's energy-trend fingerprints index ONCE; one
    admission batch then plants all three decision quadrants — 10
    byte-exact copies of corpus clips (+200000 -> reject, index
    provenance, hamming 0), 10 novel clips (+300000, own 'novel-wav:'
    stream namespace -> admit), and 10 within-batch copies of the
    novel clips (+400000 -> reject against the admitted component
    canonical). The entry returns every decision row, so the oracle
    asserts the full routing matrix; epoch replay-skip, crash-window
    convergence, write ordering, and stream==batch parity are
    pytest-gated (tests/test_av_admission.py)."""
    import os
    import tempfile

    from ai_fabric_etl_spark.operators.maintenance import maintenance_tick
    from ai_fabric_etl_spark.streaming.media_admission import (
        admit_audio_batch,
        read_decisions,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    # corpus fingerprint index persists across bench runs (see
    # _bench_fixture — this row measures the ADMISSION, and re-running
    # the same batch against the grown index provably converges)
    idx = _fixture_audio_index(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="audio_adm_state_")
    ten = docs.filter(F.col("doc_id") < 10)
    copies = multimodal.synthesize_noise_audio(ten, n_frames=1024).select(
        (F.col("media_id") + 200000).alias("media_id"), "payload",
        "mime_type", "n_bytes", "source",
    )
    novel_src = multimodal.synthesize_noise_audio(
        ten.select((F.col("doc_id") + 300000).alias("doc_id")),
        n_frames=1024, key_prefix="novel-wav:",
    )
    batch_copies = novel_src.select(
        (F.col("media_id") + 100000).alias("media_id"), "payload",
        "mime_type", "n_bytes", "source",
    )
    batch = copies.unionByName(novel_src).unionByName(batch_copies)
    state = os.path.join(tmp, "state")
    admit_audio_batch(spark, batch, idx, state, epoch_id=0, app_id="gate")
    # the scheduled maintenance tick fires INSIDE the driver entry
    # (VERDICT r13 item 2): the decisions read back below come from
    # the compacted ledger + index, so the oracle's full routing
    # matrix also pins that compaction is decision-preserving
    maintenance_tick(spark, 0, 1, [idx], state)
    return read_decisions(spark, state).select(
        "media_id", "admitted", "dup_of", "hamming"
    ).orderBy("media_id")


@register(
    "video_admission_gate",
    oracle="""
    SELECT doc_id + 200000 AS media_id, FALSE AS admitted,
           doc_id AS dup_of,
           CAST(3 + doc_id % 5 AS BIGINT) AS matched_frames,
           CAST(0 AS INTEGER) AS shift
    FROM documents WHERE doc_id < 10
    UNION ALL
    SELECT doc_id + 250000, FALSE, doc_id,
           CAST(2 + doc_id % 5 AS BIGINT), CAST(-1 AS INTEGER)
    FROM documents WHERE doc_id < 10
    UNION ALL
    SELECT doc_id + 300000, TRUE, NULL, NULL, NULL
    FROM documents WHERE doc_id < 10
    UNION ALL
    SELECT doc_id + 400000, FALSE, doc_id + 300000,
           CAST(3 + doc_id % 5 AS BIGINT), CAST(0 AS INTEGER)
    FROM documents WHERE doc_id < 10
    """,
)
def q_video_admission_gate(spark, sf_dir):
    """CONTINUOUS video admission (streaming/media_admission.
    admit_video_batch over the r11 persisted frame-hash index): the
    corpus's per-frame dHashes index ONCE (decorrelated noise frames,
    n_frames = 3 + id % 5 — oracle-computable); one admission batch
    plants FOUR quadrants — byte-exact copies (+200000 -> reject at
    shift 0 with the full frame count), HEAD-TRIMMED re-uploads
    (+250000 -> reject at their true offset -1 with n-1 frames: the
    alignment window the r10 batch operator gained, now live in the
    streaming gate), novel clips (+300000 -> admit), and within-batch
    copies of the novel clips (+400000 -> reject against the admitted
    canonical at shift 0). The oracle pins admission, provenance,
    matched-frame count, AND the reported shift for every row."""
    import os
    import tempfile

    from ai_fabric_etl_spark.operators.maintenance import maintenance_tick
    from ai_fabric_etl_spark.streaming.media_admission import (
        admit_video_batch,
        read_video_decisions,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    idx = _fixture_video_index(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="video_adm_state_")
    ten = docs.filter(F.col("doc_id") < 10)
    copies = multimodal.synthesize_noise_video(ten).select(
        (F.col("media_id") + 200000).alias("media_id"), "payload",
        "mime_type", "n_bytes", "source",
    )
    trims = multimodal.synthesize_noise_video(ten, head_trim=1).select(
        (F.col("media_id") + 250000).alias("media_id"), "payload",
        "mime_type", "n_bytes", "source",
    )
    # novel n_frames must mirror the oracle's 3 + doc_id % 5, so the
    # planted ids shift by a multiple of 5
    novel_src = multimodal.synthesize_noise_video(
        ten.select((F.col("doc_id") + 300000).alias("doc_id")),
        key_prefix="novel-",
    ).select(
        (F.col("media_id")).alias("media_id"), "payload",
        "mime_type", "n_bytes", "source",
    )
    batch_copies = novel_src.select(
        (F.col("media_id") + 100000).alias("media_id"), "payload",
        "mime_type", "n_bytes", "source",
    )
    batch = (
        copies.unionByName(trims)
        .unionByName(novel_src)
        .unionByName(batch_copies)
    )
    state = os.path.join(tmp, "state")
    admit_video_batch(spark, batch, idx, state, epoch_id=0, app_id="gate")
    # tick under the oracle (VERDICT r13 item 2) — see audio entry
    maintenance_tick(spark, 0, 1, [idx], state)
    return read_video_decisions(spark, state).select(
        "media_id", "admitted", "dup_of", "matched_frames", "shift"
    ).orderBy("media_id")


_LANGID_ALPHABETS = [
    "abcdefghijklmnop",
    "qrstuvwxyzABCDEF",
    "GHIJKLMNOPQRSTUV",
    "WXYZ0123456789_.",
]

_LANGID_CORPUS_SQL = "CASE doc_id % 4 " + " ".join(
    f"WHEN {k} THEN translate(md5(CAST(doc_id AS VARCHAR)), "
    f"'0123456789abcdef', '{a}')"
    for k, a in enumerate(_LANGID_ALPHABETS)
) + " END"

_LANGID_GRAMS = (
    "list_transform(generate_series(1, length(t) - 1), i -> substr(t, i, 2))"
)


@register(
    "text_langid",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, 'L' || CAST(doc_id % 4 AS VARCHAR) AS lang,
             {_LANGID_CORPUS_SQL} AS t
      FROM documents
    ),
    train AS (SELECT * FROM base WHERE doc_id % 5 <> 0),
    test AS (SELECT doc_id, lang, {_LANGID_GRAMS} AS g,
                    length(t) - 1 AS n
             FROM base WHERE doc_id % 5 = 0),
    tok AS (SELECT lang AS y, unnest({_LANGID_GRAMS}) AS w FROM train),
    cc AS (SELECT y, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    ny AS (SELECT y, COUNT(*) AS nt FROM tok GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM tok),
    dt AS (SELECT COUNT(*) AS dtot FROM train),
    cls AS (
      SELECT dy.y,
             CAST(ROUND(ln(2 * ny.nt + v.v), 6) AS DECIMAL(18,6)) AS b,
             CAST(ROUND(ln(dy.d), 6) AS DECIMAL(18,6))
               - CAST(ROUND(ln(dt.dtot), 6) AS DECIMAL(18,6)) AS prior
      FROM (SELECT lang AS y, COUNT(*) AS d FROM train GROUP BY 1) dy
      JOIN ny USING (y) CROSS JOIN v CROSS JOIN dt
    ),
    gm AS (SELECT doc_id, w, COUNT(*) AS m
           FROM (SELECT doc_id, unnest(g) AS w FROM test) GROUP BY 1, 2),
    hits AS (
      SELECT gm.doc_id, cc.y,
             CAST(SUM(gm.m * CAST(ROUND(ln(2 * cc.c + 1), 6)
                                  AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS hs
      FROM gm JOIN cc USING (w) GROUP BY 1, 2
    ),
    scored AS (
      SELECT g.doc_id, g.actual, g.y,
             COALESCE(h.hs, CAST(0 AS DECIMAL(38,6))) - g.n * g.b + g.prior
               AS score
      FROM (SELECT test.doc_id, test.lang AS actual, test.n, cls.*
            FROM test CROSS JOIN cls) g
      LEFT JOIN hits h ON g.doc_id = h.doc_id AND g.y = h.y
    ),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, y) AS rn
          FROM scored)
    SELECT doc_id, y AS pred_lang, actual AS actual_lang,
           (y = actual) AS is_correct,
           CAST(score * 1000000 AS BIGINT) AS score_micro
    FROM r WHERE rn = 1
    ORDER BY doc_id
    """,
)
def q_text_langid(spark, sf_dir):
    """Language identification by character-n-gram Naive Bayes
    (text.langid_classify — the fastText-shaped langid every
    CCNet/RefinedWeb/FineWeb-descended pipeline gates on BEFORE
    quality filtering; word-token NB needs vocabulary overlap, char
    distributions do not): a planted multilingual corpus — four
    synthetic languages, each doc's md5 hex stream translated through
    its language's 16-char alphabet, so per-language character and
    bigram distributions are deterministic on BOTH engines — trains
    on the 80% split and scores the 20% holdout as one broadcast
    model join + per-doc argmax. The oracle refits the identical
    model relationally (smoothing, priors, decimal ln discipline,
    tie-breaks), pinning prediction AND micro-nat score per doc;
    planted-corpus precision (including noisy mixed-alphabet docs)
    is pytest-gated."""
    from ai_fabric_etl_spark.operators.text import langid_classify

    hexs = F.md5(F.col("doc_id").cast("string").cast("binary"))
    text = None
    for k, a in enumerate(_LANGID_ALPHABETS):
        t = F.translate(hexs, "0123456789abcdef", a)
        text = F.when(F.col("doc_id") % 4 == k, t) if text is None \
            else text.when(F.col("doc_id") % 4 == k, t)
    base = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("L"), (F.col("doc_id") % 4).cast("string"))
        .alias("lang"),
        text.alias("text"),
    )
    train = base.filter(F.col("doc_id") % 5 != 0)
    test = base.filter(F.col("doc_id") % 5 == 0)
    return (
        langid_classify(train, test, n=2)
        .join(test.select("doc_id", F.col("lang").alias("actual_lang")),
              "doc_id")
        .select(
            "doc_id", "pred_lang", "actual_lang",
            (F.col("pred_lang") == F.col("actual_lang")).alias("is_correct"),
            "score_micro",
        )
        .orderBy("doc_id")
    )


@register(
    "paired_admission_gate",
    oracle="""
    SELECT doc_id + 200000 AS pair_id, FALSE AS admitted,
           'text' AS reject_modality,
           doc_id AS text_dup_of, CAST(1.0 AS DOUBLE) AS text_jaccard,
           CAST(NULL AS BIGINT) AS image_dup_of,
           CAST(NULL AS INTEGER) AS image_hamming
    FROM documents WHERE doc_id < 10
    UNION ALL
    SELECT doc_id + 210000, FALSE, 'image', NULL, NULL, doc_id, 0
    FROM documents WHERE doc_id < 10
    UNION ALL
    SELECT doc_id + 220000, FALSE, 'both', doc_id, 1.0, doc_id, 0
    FROM documents WHERE doc_id < 10
    UNION ALL
    SELECT doc_id + 230000, TRUE, NULL, NULL, NULL, NULL, NULL
    FROM documents WHERE doc_id < 10
    UNION ALL
    SELECT doc_id + 240000, FALSE, 'both', doc_id + 230000, 1.0,
           doc_id + 230000, 0
    FROM documents WHERE doc_id < 10
    """,
)
def q_paired_admission_gate(spark, sf_dir):
    """CROSS-MODAL paired admission (streaming/paired_admission — the
    LAION-style caption+image curation gate: a training pair is
    admitted only when BOTH its text and its image are novel, probing
    the MinHash LSH index and the perceptual-hash index in ONE
    decision under ONE epoch guard). The corpus indexes once (synth
    texts: 8 md5 hex words per doc; synth noise images); one batch
    then plants all five quadrants — text-dup (+200000), image-dup
    (+210000), both-dup (+220000), fully-novel (+230000, admitted),
    and a within-batch both-copy of the novel pair (+240000, rejected
    against the admitted component canonical). The oracle pins
    admission, per-modality provenance (which index id matched, at
    what Jaccard/hamming), and the reject_modality label for every
    row; epoch replay, crash-window convergence across the three
    inserts, and stream==batch parity are pytest-gated."""
    import os
    import tempfile

    from ai_fabric_etl_spark.operators import dedup
    from ai_fabric_etl_spark.operators.maintenance import maintenance_tick
    from ai_fabric_etl_spark.streaming.paired_admission import (
        admit_pairs_batch,
        read_decisions,
    )

    synth_text = _synth_pair_text

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    tidx, iidx = _fixture_paired_indexes(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="paired_adm_state_")

    ten = docs.filter(F.col("doc_id") < 10)

    def images(id_offset, key_prefix=""):
        return multimodal.synthesize_noise_images(
            ten, key_prefix=key_prefix
        ).select(
            (F.col("media_id") + id_offset).alias("pair_id"), "payload"
        )

    def texts(id_offset, prefix):
        return ten.select(
            (F.col("doc_id") + id_offset).alias("pair_id"),
            synth_text(prefix).alias("text"),
        )

    quadrants = [
        # (id offset, text prefix, image key prefix)
        (200000, "txt:", "nov-a:"),     # corpus text + novel image
        (210000, "nov-b:", ""),         # novel text + corpus image
        (220000, "txt:", ""),           # corpus text + corpus image
        (230000, "nov-c:", "nov-d:"),   # fully novel -> admit
        (240000, "nov-c:", "nov-d:"),   # within-batch copy of +230000
    ]
    batch = None
    for off, tp, ip in quadrants:
        q = texts(off, tp).join(images(off, ip), "pair_id")
        batch = q if batch is None else batch.unionByName(q)

    state = os.path.join(tmp, "state")
    admit_pairs_batch(spark, batch, tidx, iidx, state,
                      epoch_id=0, app_id="gate")
    # tick under the oracle (VERDICT r13 item 2) — BOTH indexes
    maintenance_tick(spark, 0, 1, [tidx, iidx], state)
    return read_decisions(spark, state).select(
        "pair_id", "admitted", "reject_modality",
        "text_dup_of", "text_jaccard", "image_dup_of", "image_hamming",
    ).orderBy("pair_id")


@register(
    "embedding_admission_gate",
    oracle="""
    SELECT vec_id + 200000 AS vec_id, FALSE AS admitted,
           vec_id AS dup_of, CAST(1.0 AS DOUBLE) AS cosine
    FROM embeddings WHERE vec_id < 10
    UNION ALL
    SELECT vec_id + 300000, TRUE, NULL, NULL
    FROM embeddings WHERE vec_id < 10
    UNION ALL
    SELECT vec_id + 400000, FALSE, vec_id + 300000, 1.0
    FROM embeddings WHERE vec_id < 10
    """,
)
def q_embedding_admission_gate(spark, sf_dir):
    """CONTINUOUS embedding admission (streaming/embedding_admission
    — r11: the fifth modality of the admission family, so semantic
    near-dup runs as a stream gate over the persisted hyperplane-LSH
    index instead of corpus-vs-corpus per snapshot): the corpus
    indexes once; one admission batch plants the three routing
    quadrants — 10 byte-exact copies of corpus vectors (+200000 ->
    reject, index provenance, cosine 1.0), 10 novel vectors
    (+300000: corpus vector i with coordinate i bumped +1000 — the
    bumped vector's cosine against EVERY corpus vector is bounded by
    max |w_i|/||w|| + ||v||/1000 < 0.55 across all SFs, measured,
    far under the 0.95 threshold, while distinct bumps are mutually
    near-orthogonal -> admit), and 10 within-batch copies of the
    novel vectors (+400000 -> reject against the admitted component
    canonical). Epoch replay, the receipt-guarded crash windows, and
    stream==batch parity are pytest-gated."""
    import os
    import tempfile

    from ai_fabric_etl_spark.operators.maintenance import maintenance_tick
    from ai_fabric_etl_spark.streaming.embedding_admission import (
        admit_embeddings_batch,
        read_decisions,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = _fixture_emb_index(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="emb_adm_state_")

    ten = emb.filter(F.col("vec_id") < 10)
    copies = ten.select(
        (F.col("vec_id") + 200000).alias("vec_id"), "embedding"
    )
    bump = F.transform(
        F.col("embedding"),
        lambda x, j: (
            x
            + F.when(j == F.col("vec_id").cast("int"), F.lit(1000.0))
            .otherwise(F.lit(0.0))
        ).cast("float"),
    )
    # bump BEFORE re-aliasing vec_id: a lambda's F.col("vec_id") in
    # the same select resolves against the shifted output alias and
    # the bump silently never fires
    novel = ten.select("vec_id", bump.alias("embedding")).select(
        (F.col("vec_id") + 300000).alias("vec_id"), "embedding"
    )
    batch_copies = novel.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    batch = copies.unionByName(novel).unionByName(batch_copies)
    state = os.path.join(tmp, "state")
    admit_embeddings_batch(spark, batch, idx, state, epoch_id=0,
                           app_id="gate", threshold=0.95)
    # tick under the oracle (VERDICT r13 item 2) — see audio entry
    maintenance_tick(spark, 0, 1, [idx], state)
    return read_decisions(spark, state).select(
        "vec_id", "admitted", "dup_of", "cosine"
    ).orderBy("vec_id")

"""X12 pipeline entries for the driver contract.

These exercise the engine's core domain capability (distributed X12
parse -> silver -> gold marts -> 997 acks) on the deterministic
in-repo corpus.

Correctness strategy (VERDICT r1 item 3): the parse itself (U9,
mapInPandas) is not SQL-expressible, so ``x12_silver_transactions``
stays rows-only — but the ENTRY eagerly writes the parsed silver
(with the typed ``parsed`` struct) to a repo-local parquet cache, and
every downstream gold mart / view entry carries a full ANSI-SQL
DuckDB oracle over that parquet (``read_parquet``), transcribed from
pipeline/gold.py semantics (which mirror gold_x12_analytics.py:443-796).
That turns the whole flagship family from rows-only into value-hashed
rows.

Determinism: fixed corpus (x12/testgen.generate_corpus, seeded), fixed
clock, UTC session — the silver parquet is bit-stable across runs, so
oracle results cannot drift between the Spark pass and the DuckDB pass.
Derived doubles (avg / pct / float sums) are ROUND()ed to a fixed scale
on BOTH sides so engine-version ulp differences can't flip the value
hash (the round-1 failure mode).

The silver build is memoized per SparkSession and persisted: fifteen
registered entries share ONE parse instead of re-parsing per entry
(round-1 driver coverage gap: the x12 family never got correctness
rows, likely a time budget — this makes each entry a sub-second agg
over a cached ~60-row table).
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_fabric_etl_spark.pipeline import gold
from ai_fabric_etl_spark.pipeline.silver import parse_to_silver, silver_with_parsed
from ai_fabric_etl_spark.queries.catalog import register
from ai_fabric_etl_spark.x12.testgen import expected_silver, generate_corpus

_NOW = datetime(2025, 1, 2, 12, 0, 0)  # fixed clock for determinism

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SILVER_CACHE = os.path.join(_REPO_ROOT, ".cache", "x12_silver")

# memo: one parse per SparkSession (15 entries share it)
_SILVER_MEMO: dict[int, DataFrame] = {}
_CACHE_WRITTEN: set[int] = set()

# Hydrate the runtime oracle cache from the committed golden fixture
# when absent (fresh clone): the mart oracles' read_parquet path then
# resolves no matter what order the driver runs Spark queries and
# DuckDB oracles in. Entries still overwrite the runtime copy with a
# freshly parsed silver on first use, so the fixture can never mask a
# parser change (tests assert fixture == fresh parse).
_GOLDEN = os.path.join(_REPO_ROOT, "tests", "fixtures", "x12_silver_golden")
if not os.path.isdir(_SILVER_CACHE) and os.path.isdir(_GOLDEN):
    import contextlib
    import shutil

    # best-effort: concurrent importers may race (both copy the same
    # bytes — dirs_exist_ok makes that benign) and a read-only checkout
    # must not fail the whole registry import
    with contextlib.suppress(OSError):
        shutil.copytree(_GOLDEN, _SILVER_CACHE, dirs_exist_ok=True)


def _silver(spark: SparkSession) -> DataFrame:
    """Parsed silver (typed struct), persisted and memoized per session.
    Lazy — first action materializes the cache; no sink side effects,
    so the bench's parse-throughput entry measures the parse alone."""
    key = id(spark)
    cached = _SILVER_MEMO.get(key)
    if cached is not None:
        return cached
    files = spark.createDataFrame(generate_corpus(), ["file_name", "content"])
    # modest corpus: keep it in a few partitions rather than 32 empty ones
    df = silver_with_parsed(
        parse_to_silver(files.repartition(4), batch_id="entry", now=_NOW)
    ).persist()
    _SILVER_MEMO[key] = df
    return df


_EXPECTED_CACHE = os.path.join(_REPO_ROOT, ".cache", "x12_expected_silver")


def _write_expected_silver() -> str:
    """Materialize the spec-derived ground truth (testgen.expected_silver,
    built WITHOUT running the parser) as a parquet DuckDB can read —
    the independent oracle side for x12_silver_transactions. Pure
    pyarrow: no Spark job, negligible cost, idempotent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = expected_silver(now=_NOW)
    cols = list(rows[0].keys())
    schema = pa.schema(
        [
            ("batch_id", pa.string()),
            ("file_name", pa.string()),
            ("processing_timestamp", pa.timestamp("us")),
            ("interchange_control_number", pa.string()),
            ("functional_group_number", pa.string()),
            ("transaction_set_control_number", pa.string()),
            ("transaction_type", pa.string()),
            ("sender_id", pa.string()),
            ("receiver_id", pa.string()),
            ("transaction_date", pa.string()),
            ("quality_score", pa.int32()),
            ("is_valid", pa.bool_()),
            ("processing_date", pa.date32()),
        ]
    )
    table = pa.Table.from_pylist(rows, schema=schema)
    assert table.num_columns == len(cols)
    os.makedirs(_EXPECTED_CACHE, exist_ok=True)
    pq.write_table(table, os.path.join(_EXPECTED_CACHE, "expected.parquet"))
    return _EXPECTED_CACHE


# the oracle side must exist whenever DuckDB runs, regardless of the
# driver's Spark-vs-oracle execution order — write it at import time
# (best-effort: read-only checkouts still import; the entry rewrites)
import contextlib as _contextlib

with _contextlib.suppress(OSError):
    _write_expected_silver()


def _silver_oracled(spark: SparkSession) -> DataFrame:
    """_silver plus the eager parquet write the DuckDB mart oracles
    read (one job per process; subsequent entries reuse both the
    persisted DataFrame and the on-disk parquet)."""
    df = _silver(spark)
    key = id(spark)
    if key not in _CACHE_WRITTEN:
        df.write.mode("overwrite").parquet(_SILVER_CACHE)
        _CACHE_WRITTEN.add(key)
    return df


# ---------------------------------------------------------------------------
# oracle-side SQL building blocks
# ---------------------------------------------------------------------------

_SRC = f"read_parquet('{_SILVER_CACHE}/*.parquet')"
_VALID = f"(SELECT * FROM {_SRC} WHERE is_valid)"


def _outer_unnest(list_expr: str, alias: str) -> str:
    """DuckDB twin of explode_outer: empty/NULL lists yield one NULL row."""
    return (
        f"unnest(CASE WHEN {list_expr} IS NULL OR len({list_expr}) = 0 "
        f"THEN [NULL] ELSE {list_expr} END) AS {alias}"
    )


@register(
    "x12_silver_transactions",
    oracle=f"SELECT * FROM read_parquet('{_EXPECTED_CACHE}/*.parquet')",
)
def x12_silver_transactions(spark, sf_dir):
    """U9: the file->transaction-rows UDTF via mapInPandas.

    Value-oracled (VERDICT r1/r3: this was the last rows-only flagship
    row): the oracle reads a parquet of SPEC-derived expected rows —
    control numbers, partners, dates, and the quality contract taken
    from the generator's own construction loop
    (testgen.expected_silver), never from the parser. A parse
    regression in any envelope/identity/quality column flips the
    driver's value hash. The two free-text JSON columns (parsed_data,
    validation_results) are parser-internal representations with no
    spec-level canonical form; they are exercised by the typed-struct
    mart oracles below and the pytest parity suite.

    The entry also materializes the silver parquet every mart oracle
    below reads.
    """
    _write_expected_silver()
    return _silver_oracled(spark).drop(
        "parsed", "parsed_data", "validation_results"
    )


@register(
    "x12_gold_transaction_summary",
    oracle=f"""
    SELECT processing_date, transaction_type, sender_id, receiver_id,
           COUNT(*) AS transaction_count,
           ROUND(AVG(quality_score), 6) AS average_quality_score,
           MIN(processing_timestamp) AS first_processed,
           MAX(processing_timestamp) AS last_processed,
           COUNT(DISTINCT interchange_control_number) AS unique_interchanges,
           COUNT(DISTINCT file_name) AS unique_files
    FROM {_VALID}
    GROUP BY 1, 2, 3, 4
    """,
)
def x12_gold_transaction_summary(spark, sf_dir):
    """A1 on real X12: gold_transaction_summary over parsed silver."""
    out = gold.transaction_summary(_silver_oracled(spark)).drop("created_at")
    return out.withColumn(
        "average_quality_score", F.round("average_quality_score", 6)
    )


@register(
    "x12_gold_claim_analytics",
    oracle=f"""
    WITH base AS (SELECT * FROM {_VALID} WHERE transaction_type = '837'),
    cl AS (
        SELECT file_name, functional_group_number,
               transaction_set_control_number,
               unnest(parsed.claims) AS claim
        FROM base
    ),
    ln AS (
        SELECT file_name, functional_group_number,
               transaction_set_control_number,
               {_outer_unnest('claim.service_lines', 'line')}
        FROM cl
    ),
    calc AS (
        SELECT file_name, functional_group_number,
               transaction_set_control_number,
               SUM(COALESCE(line.line_amount, 0.0)) AS calculated_total,
               COUNT(DISTINCT line.procedure) AS unique_service_count
        FROM ln GROUP BY 1, 2, 3
    )
    SELECT b.processing_date, b.file_name, b.functional_group_number,
           b.transaction_set_control_number,
           b.sender_id, b.receiver_id, b.quality_score,
           CAST(b.parsed.service_line_count AS INTEGER) AS total_service_lines,
           CAST(b.parsed.total_claim_amount AS DOUBLE) AS total_claim_amount,
           b.parsed.provider.identifier AS provider_npi,
           ROUND(COALESCE(c.calculated_total, 0.0), 4) AS calculated_total,
           COALESCE(c.unique_service_count, 0) AS unique_service_count,
           ROUND(ABS(CAST(b.parsed.total_claim_amount AS DOUBLE)
                     - COALESCE(c.calculated_total, 0.0)), 4) AS amount_variance,
           CASE WHEN COALESCE(c.calculated_total, 0.0) > 0
                THEN ROUND(ABS(CAST(b.parsed.total_claim_amount AS DOUBLE)
                               - c.calculated_total)
                           / c.calculated_total * 100.0, 6)
                ELSE 0.0 END AS variance_percentage
    FROM base b
    LEFT JOIN calc c USING (file_name, functional_group_number,
                            transaction_set_control_number)
    """,
)
def x12_gold_claim_analytics(spark, sf_dir):
    """U1 on real X12: explode service_lines -> per-claim variance."""
    out = gold.claim_analytics(_silver_oracled(spark))
    return (
        out.withColumn("calculated_total", F.round("calculated_total", 4))
        .withColumn("amount_variance", F.round("amount_variance", 4))
        .withColumn("variance_percentage", F.round("variance_percentage", 6))
    )


@register(
    "x12_gold_business_kpis",
    oracle=f"""
    SELECT COUNT(*) AS total_transactions,
           COUNT(DISTINCT file_name) AS unique_files,
           COUNT(DISTINCT transaction_type) AS unique_transaction_types,
           COUNT(DISTINCT sender_id) AS unique_senders,
           COUNT(DISTINCT receiver_id) AS unique_receivers,
           COUNT(DISTINCT sender_id || '-' || receiver_id) AS unique_trading_partnerships,
           ROUND(AVG(quality_score), 6) AS average_quality_score,
           MAX(processing_timestamp) AS last_processed
    FROM {_VALID}
    """,
)
def x12_gold_business_kpis(spark, sf_dir):
    """A4 on real X12, with the reference's :778 bug fixed."""
    out = gold.business_kpis(_silver_oracled(spark))
    return out.withColumn(
        "average_quality_score", F.round("average_quality_score", 6)
    )


@register(
    "x12_ack_997",
    oracle=f"""
    WITH g AS (
        SELECT sender_id, receiver_id, interchange_control_number,
               COUNT(*) AS n,
               MAX(processing_timestamp) AS last_processed,
               CASE MIN(transaction_type)
                    WHEN '837' THEN 'HC' WHEN '835' THEN 'HP'
                    WHEN '834' THEN 'BE' WHEN '270' THEN 'HS'
                    WHEN '271' THEN 'HB' WHEN '276' THEN 'HR'
                    WHEN '277' THEN 'HN' WHEN '278' THEN 'HI'
                    WHEN '279' THEN 'HI' ELSE 'FA' END AS group_code,
               string_agg('AK2*' || transaction_type || '*'
                          || transaction_set_control_number
                          || '~AK5*A~', ''
                          ORDER BY transaction_set_control_number) AS ak_body
        FROM {{src}}
        GROUP BY 1, 2, 3
    )
    SELECT sender_id, receiver_id, interchange_control_number,
           n AS transaction_count,
           last_processed,
           'ISA*00*' || repeat(' ', 10) || '*00*' || repeat(' ', 10)
             || '*ZZ*' || rpad(receiver_id, 15, ' ')
             || '*ZZ*' || rpad(sender_id, 15, ' ')
             || '*250101*0000*^*00501*'
             || lpad(interchange_control_number, 9, '0') || '*0*T*:~'
             || 'GS*FA*' || receiver_id || '*' || sender_id
             || '*20250101*0000*' || interchange_control_number || '*X*005010~'
             || 'ST*997*0001~'
             || 'AK1*' || group_code || '*' || interchange_control_number || '~'
             || ak_body
             || 'AK9*A*' || n || '*' || n || '*' || n || '~'
             || 'SE*' || (4 + 2 * n) || '*0001~'
             || 'GE*1*' || interchange_control_number || '~'
             || 'IEA*1*' || lpad(interchange_control_number, 9, '0') || '~'
             AS ack_997,
           'ack_997_' || sender_id || '_' || interchange_control_number
             || '.x12' AS ack_file_name
    FROM g
    """.replace("{src}", _SRC),
)
def x12_ack_997(spark, sf_dir):
    """U8/A6: 997 ack generation (collect_list + templating UDF).

    The oracle rebuilds the ENTIRE 997 interchange text in ANSI SQL
    (fixed-width ISA padding via rpad/lpad, the AK2/AK5 loop via
    ordered string_agg, SE count = 4 + 2n), so the templating UDF is
    value-verified byte for byte — not just row-counted."""
    from ai_fabric_etl_spark.x12.ack997 import generate_acks

    return generate_acks(_silver_oracled(spark)).drop("control_numbers")


@register(
    "x12_view_daily_summary",
    oracle=f"""
    SELECT processing_date,
           COUNT(*) AS total_files,
           ROUND(AVG(quality_score), 6) AS avg_quality_score,
           COUNT(CASE WHEN quality_score > 80 THEN 1 END) AS high_quality_files,
           COUNT(CASE WHEN quality_score BETWEEN 50 AND 80 THEN 1 END) AS medium_quality_files,
           COUNT(CASE WHEN quality_score < 50 THEN 1 END) AS low_quality_files
    FROM {_SRC}
    GROUP BY processing_date
    """,
)
def x12_view_daily_summary(spark, sf_dir):
    """A8: SQL view dialect — v_daily_processing_summary
    (init.sql:150-160) over parsed silver via spark.sql."""
    from ai_fabric_etl_spark.pipeline.views import register_views

    register_views(spark, _silver_oracled(spark).drop("parsed"))
    out = spark.sql("SELECT * FROM v_daily_processing_summary")
    return out.withColumn("avg_quality_score", F.round("avg_quality_score", 6))


@register(
    "x12_view_type_breakdown",
    oracle=f"""
    SELECT transaction_type,
           COUNT(*) AS file_count,
           ROUND(AVG(quality_score), 6) AS avg_quality_score,
           MIN(processing_timestamp) AS first_processed,
           MAX(processing_timestamp) AS last_processed
    FROM {_SRC}
    GROUP BY transaction_type
    """,
)
def x12_view_type_breakdown(spark, sf_dir):
    """A8/O1: v_transaction_type_breakdown (init.sql:162-172) with its
    ORDER BY file_count DESC."""
    from ai_fabric_etl_spark.pipeline.views import register_views

    register_views(spark, _silver_oracled(spark).drop("parsed"))
    out = spark.sql("SELECT * FROM v_transaction_type_breakdown")
    return out.withColumn("avg_quality_score", F.round("avg_quality_score", 6))


# ---------------------------------------------------------------------------
# the rest of the 11-mart gold layer (SURVEY §2.4 A2/A3, §2.10 U2-U7),
# including the two marts the reference promised but never built
# (eligibility, claim_status — README.md:256-257), each with a full
# DuckDB value oracle over the silver parquet
# ---------------------------------------------------------------------------


def _mart_entry(mart_fn, round_cols: dict[str, int] | None = None):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = mart_fn(_silver_oracled(spark))
        for col, scale in (round_cols or {}).items():
            out = out.withColumn(col, F.round(col, scale))
        return out

    return q


_TYPE_COUNTS = ",\n           ".join(
    # CAST to BIGINT: DuckDB SUM(int) yields HUGEINT, which the
    # driver's fetch path canonicalizes differently than Spark's
    # bigint (the r02 hash-mismatch class)
    f"CAST(SUM(CASE WHEN transaction_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS count_{t}"
    for t in ("837", "835", "834", "270", "271", "276", "277", "278", "279")
)

_MART_ORACLES = {
    # U2 — per-row 835 select + derived variance/ratio
    "x12_gold_payment_analytics": (
        gold.payment_analytics,
        {"payment_ratio": 6},
        f"""
        SELECT processing_date, file_name, functional_group_number,
               transaction_set_control_number,
               sender_id, receiver_id,
               CAST(parsed.claim_count AS INTEGER) AS total_claims,
               CAST(parsed.payment_amount AS DOUBLE) AS total_payment_amount,
               CAST(parsed.total_charge_amount AS DOUBLE) AS total_charge_amount,
               CAST(parsed.total_paid_amount AS DOUBLE) AS total_paid_amount,
               CAST(parsed.total_patient_responsibility AS DOUBLE) AS total_patient_responsibility,
               parsed.payer.name AS payer_name,
               parsed.payer.id AS payer_id,
               ABS(CAST(parsed.payment_amount AS DOUBLE)
                   - CAST(parsed.total_paid_amount AS DOUBLE)) AS payment_variance,
               CASE WHEN CAST(parsed.total_charge_amount AS DOUBLE) > 0
                    THEN ROUND(CAST(parsed.total_paid_amount AS DOUBLE)
                               / CAST(parsed.total_charge_amount AS DOUBLE) * 100.0, 6)
                    ELSE 0.0 END AS payment_ratio
        FROM {_VALID} WHERE transaction_type = '835'
        """,
    ),
    # U3 — 834 per-row + coverage-type rollup + ratios
    "x12_gold_enrollment_analytics": (
        gold.enrollment_analytics,
        {"enrollment_ratio": 6, "termination_ratio": 6},
        f"""
        WITH base AS (SELECT * FROM {_VALID} WHERE transaction_type = '834'),
        mem AS (
            SELECT file_name, functional_group_number,
                   transaction_set_control_number,
                   unnest(parsed.members) AS m
            FROM base
        ),
        covs AS (
            SELECT file_name, functional_group_number,
                   transaction_set_control_number,
                   {_outer_unnest('m.coverages', 'c')}
            FROM mem
        ),
        cov AS (
            SELECT file_name, functional_group_number,
                   transaction_set_control_number,
                   COUNT(DISTINCT c.coverage_type) AS unique_coverage_types
            FROM covs GROUP BY 1, 2, 3
        )
        SELECT b.processing_date, b.file_name, b.functional_group_number,
               b.transaction_set_control_number,
               b.sender_id, b.receiver_id,
               CAST(b.parsed.member_count AS INTEGER) AS total_members,
               CAST(b.parsed.new_enrollments AS INTEGER) AS new_enrollments,
               CAST(b.parsed.terminations AS INTEGER) AS terminations,
               CAST(b.parsed.changes AS INTEGER) AS changes,
               b.parsed.sponsor.name AS sponsor_name,
               b.parsed.sponsor.id AS sponsor_id,
               COALESCE(v.unique_coverage_types, 0) AS unique_coverage_types,
               CASE WHEN b.parsed.member_count > 0
                    THEN ROUND(b.parsed.new_enrollments * 100.0
                               / b.parsed.member_count, 6)
                    ELSE 0.0 END AS enrollment_ratio,
               CASE WHEN b.parsed.member_count > 0
                    THEN ROUND(b.parsed.terminations * 100.0
                               / b.parsed.member_count, 6)
                    ELSE 0.0 END AS termination_ratio
        FROM base b
        LEFT JOIN cov v USING (file_name, functional_group_number,
                               transaction_set_control_number)
        """,
    ),
    # A2 — partner matrix with 9 conditional type counts
    "x12_gold_trading_partner_analytics": (
        gold.trading_partner_analytics,
        {"average_quality_score": 6},
        f"""
        SELECT processing_date, sender_id, receiver_id,
               COUNT(*) AS total_transactions,
               COUNT(DISTINCT transaction_type) AS unique_transaction_types,
               ROUND(AVG(quality_score), 6) AS average_quality_score,
               {_TYPE_COUNTS},
               COUNT(DISTINCT interchange_control_number) AS unique_interchanges,
               MIN(processing_timestamp) AS first_transaction,
               MAX(processing_timestamp) AS last_transaction,
               sender_id || '-' || receiver_id AS trading_partner_id
        FROM {_VALID}
        GROUP BY processing_date, sender_id, receiver_id
        """,
    ),
    # U4 — eligibility (270/271), promised-but-missing in the reference
    "x12_gold_eligibility_analytics": (
        gold.eligibility_analytics,
        {"average_quality_score": 6},
        f"""
        SELECT processing_date, sender_id, receiver_id,
               CAST(SUM(CASE WHEN transaction_type = '270' THEN 1 ELSE 0 END) AS BIGINT) AS inquiries,
               CAST(SUM(CASE WHEN transaction_type = '271' THEN 1 ELSE 0 END) AS BIGINT) AS responses,
               CAST(SUM(COALESCE(parsed.inquiry_count, 0)) AS BIGINT) AS total_inquiry_items,
               CAST(SUM(COALESCE(parsed.benefit_count, 0)) AS BIGINT) AS total_benefits,
               CAST(SUM(CASE WHEN COALESCE(parsed.active_coverage, FALSE)
                        THEN 1 ELSE 0 END) AS BIGINT) AS active_coverage_count,
               ROUND(AVG(quality_score), 6) AS average_quality_score
        FROM {_VALID} WHERE transaction_type IN ('270', '271')
        GROUP BY processing_date, sender_id, receiver_id
        """,
    ),
    # U5 — claim status (276/277), promised-but-missing in the reference
    "x12_gold_claim_status_analytics": (
        gold.claim_status_analytics,
        {"total_charge_amount": 4, "total_paid_amount": 4},
        f"""
        WITH base AS (
            SELECT * FROM {_VALID} WHERE transaction_type IN ('276', '277')
        ),
        tx AS (
            SELECT processing_date, sender_id, receiver_id,
                   CAST(SUM(CASE WHEN transaction_type = '276' THEN 1 ELSE 0 END) AS BIGINT) AS status_requests,
                   CAST(SUM(CASE WHEN transaction_type = '277' THEN 1 ELSE 0 END) AS BIGINT) AS response_transactions
            FROM base GROUP BY 1, 2, 3
        ),
        st AS (
            SELECT processing_date, sender_id, receiver_id,
                   {_outer_unnest('parsed.claim_status', 's')}
            FROM base WHERE transaction_type = '277'
        ),
        ln AS (
            SELECT processing_date, sender_id, receiver_id,
                   CAST(SUM(CASE WHEN s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS status_responses,
                   SUM(COALESCE(s.charge_amount, 0.0)) AS total_charge_amount,
                   SUM(COALESCE(s.paid_amount, 0.0)) AS total_paid_amount
            FROM st GROUP BY 1, 2, 3
        )
        SELECT t.processing_date, t.sender_id, t.receiver_id,
               t.status_requests, t.response_transactions,
               CAST(COALESCE(l.status_responses, 0) AS BIGINT) AS status_responses,
               ROUND(COALESCE(l.total_charge_amount, 0.0), 4) AS total_charge_amount,
               ROUND(COALESCE(l.total_paid_amount, 0.0), 4) AS total_paid_amount
        FROM tx t LEFT JOIN ln l USING (processing_date, sender_id, receiver_id)
        """,
    ),
    # U6 — 278 preauth requests (pure per-row projection)
    "x12_gold_preauth_request_analytics": (
        gold.preauth_request_analytics,
        None,
        f"""
        SELECT processing_date, file_name, functional_group_number,
               transaction_set_control_number,
               sender_id, receiver_id,
               CAST(parsed.service_count AS INTEGER) AS service_count,
               CAST(parsed.total_requested_amount AS DOUBLE) AS total_requested_amount,
               parsed.um.request_category AS request_category
        FROM {_VALID} WHERE transaction_type = '278'
        """,
    ),
    # U7 — 279 action buckets + rates
    "x12_gold_preauth_response_analytics": (
        gold.preauth_response_analytics,
        {"approval_rate": 6, "denial_rate": 6},
        f"""
        SELECT processing_date, file_name, functional_group_number,
               transaction_set_control_number,
               sender_id, receiver_id,
               CAST(parsed.review_count AS INTEGER) AS review_count,
               CAST(parsed.approved_count AS INTEGER) AS approved_count,
               CAST(parsed.denied_count AS INTEGER) AS denied_count,
               CAST(parsed.pending_count AS INTEGER) AS pending_count,
               CASE WHEN parsed.review_count > 0
                    THEN ROUND(parsed.approved_count * 100.0
                               / parsed.review_count, 6)
                    ELSE 0.0 END AS approval_rate,
               CASE WHEN parsed.review_count > 0
                    THEN ROUND(parsed.denied_count * 100.0
                               / parsed.review_count, 6)
                    ELSE 0.0 END AS denial_rate
        FROM {_VALID} WHERE transaction_type = '279'
        """,
    ),
    # A3 — quality bands (NO is_valid filter: quality covers invalid rows)
    "x12_gold_data_quality_metrics": (
        gold.data_quality_metrics,
        {
            "average_quality_score": 6,
            "high_quality_percentage": 6,
            "medium_quality_percentage": 6,
            "low_quality_percentage": 6,
        },
        f"""
        SELECT processing_date, transaction_type,
               COUNT(*) AS transaction_count,
               ROUND(AVG(quality_score), 6) AS average_quality_score,
               MIN(quality_score) AS min_quality_score,
               MAX(quality_score) AS max_quality_score,
               CAST(SUM(CASE WHEN quality_score >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS high_quality_count,
               CAST(SUM(CASE WHEN quality_score >= 70 AND quality_score < 90 THEN 1 ELSE 0 END) AS BIGINT) AS medium_quality_count,
               CAST(SUM(CASE WHEN quality_score < 70 THEN 1 ELSE 0 END) AS BIGINT) AS low_quality_count,
               ROUND(SUM(CASE WHEN quality_score >= 90 THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 6) AS high_quality_percentage,
               ROUND(SUM(CASE WHEN quality_score >= 70 AND quality_score < 90 THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 6) AS medium_quality_percentage,
               ROUND(SUM(CASE WHEN quality_score < 70 THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 6) AS low_quality_percentage,
               COUNT(DISTINCT file_name) AS unique_files,
               COUNT(DISTINCT sender_id) AS unique_senders,
               COUNT(DISTINCT receiver_id) AS unique_receivers
        FROM {_SRC}
        GROUP BY processing_date, transaction_type
        """,
    ),
}

for _name, (_fn, _round_cols, _oracle) in _MART_ORACLES.items():
    register(_name, oracle=_oracle)(_mart_entry(_fn, _round_cols))


# ---------------------------------------------------------------------------
# the same parse as a first-class Spark format (Python Data Source)
# ---------------------------------------------------------------------------

_DS_LANDING = os.path.join(_REPO_ROOT, ".cache", "x12_landing_files")


def _landing_files() -> str:
    """Materialize the generated corpus as actual .x12 files once per
    checkout (the data source reads FILES, like production landing
    zones — not in-memory rows)."""
    marker = os.path.join(_DS_LANDING, "_complete")
    if not os.path.exists(marker):
        os.makedirs(_DS_LANDING, exist_ok=True)
        for name, content in generate_corpus():
            with open(os.path.join(_DS_LANDING, name), "w", encoding="utf-8") as fh:
                fh.write(content)
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write("ok")
    return _DS_LANDING


@register(
    "x12_datasource_scan",
    oracle=f"SELECT * FROM read_parquet('{_EXPECTED_CACHE}/*.parquet')",
)
def x12_datasource_scan(spark, sf_dir):
    """U9 through the OTHER door: ``spark.read.format("x12")`` — the
    Spark 4 Python Data Source (sources/x12_datasource.py) planning
    its own file partitions — must hit the same spec-derived
    expected-silver oracle as the mapInPandas pipeline path. One
    format, two access paths, one ground truth."""
    from ai_fabric_etl_spark.sources.x12_datasource import register as _reg

    _write_expected_silver()
    _reg(spark)
    return (
        spark.read.format("x12")
        .option("batchid", "entry")
        .option("now", _NOW.isoformat())
        .option("numpartitions", "8")
        .load(_landing_files())
        .drop("parsed_data", "validation_results")
    )

"""Real-database connector (sources/sqlite_datasource.py): JDBC-style
partitioned reads, predicate pushdown compiled into SQL, exact
logical-type round trips, two-phase-commit writes, foreign-database
affinity inference. Reference parity target: the Postgres/JDBC edge in
local-development/process_test_data.py:53-153."""

from __future__ import annotations

import datetime
import os
import sqlite3
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ai_fabric_etl_spark.sources import sqlite_datasource as sq


@pytest.fixture(autouse=True)
def _register(spark):
    sq.register(spark)


def _db(tmp_path, name="t.db"):
    return str(tmp_path / name)


def _write(df, db, table, mode="overwrite"):
    df.write.format("sqlite").option("dbpath", db).option(
        "dbtable", table
    ).mode(mode).save()


def _read(spark, db, table, **opts):
    r = spark.read.format("sqlite").option("dbpath", db).option(
        "dbtable", table
    )
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_all_types_roundtrip_exact(spark, tmp_path):
    """Every supported logical type survives the INTEGER/REAL/TEXT/
    BLOB storage round trip bit-exactly, including NULLs: the recorded
    _spark_schema side table restores decimals, dates, timestamps and
    booleans that SQLite itself cannot represent."""
    db = _db(tmp_path)
    rows = [
        (1, 2**40, 1.5, True, "abc", datetime.date(2024, 2, 29),
         datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
         Decimal("12345.67"), bytearray(b"\x00\x01\xff")),
        (2, None, None, False, None, None, None, None, None),
        (None, -7, -0.25, None, "", datetime.date(1970, 1, 1),
         datetime.datetime(1999, 12, 31, 23, 59, 59),
         Decimal("-0.01"), bytearray(b"")),
    ]
    schema = (
        "i int, l long, d double, b boolean, s string, dt date, "
        "ts timestamp_ntz, dec decimal(12,2), bin binary"
    )
    df = spark.createDataFrame(rows, schema)
    _write(df, db, "alltypes")
    back = _read(spark, db, "alltypes")
    assert back.schema == df.schema
    norm = lambda r: tuple(  # noqa: E731
        bytes(v) if isinstance(v, (bytes, bytearray)) else v for v in r
    )
    assert sorted(map(norm, back.collect()), key=str) == sorted(
        map(norm, df.collect()), key=str
    )


def test_partitioned_read_complete_and_disjoint(spark, tmp_path):
    db = _db(tmp_path)
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    _write(df, db, "nums")
    # default rowid partitioning
    back = _read(spark, db, "nums", numpartitions=8)
    assert back.rdd.getNumPartitions() == 8
    assert back.count() == 1000
    assert sorted(r.k for r in back.collect()) == list(range(1000))
    # explicit partition column + bounds (JDBC options)
    back2 = _read(
        spark, db, "nums", numpartitions=4, partitioncolumn="k",
        lowerbound=0, upperbound=999,
    )
    assert back2.count() == 1000
    assert set(r.k for r in back2.collect()) == set(range(1000))


def test_partition_planner_edge_cases(spark, tmp_path):
    db = _db(tmp_path)
    # empty table: single partition, zero rows
    empty = spark.range(0).select(F.col("id").alias("k"))
    _write(empty, db, "empty")
    assert _read(spark, db, "empty", numpartitions=4).count() == 0
    # more partitions than rows: planner clamps
    three = spark.range(3).select(F.col("id").alias("k"))
    _write(three, db, "three")
    got = _read(spark, db, "three", numpartitions=16)
    assert sorted(r.k for r in got.collect()) == [0, 1, 2]


def test_filter_pushdown_compiles_and_matches(spark, tmp_path):
    """Pushed filters must not change results (Spark re-applies them);
    the compiled SQL is checked at the unit level below."""
    db = _db(tmp_path)
    df = spark.createDataFrame(
        [(i, f"name{i % 10}", float(i), None if i % 5 == 0 else i % 3)
         for i in range(200)],
        "k long, name string, x double, grp long",
    )
    _write(df, db, "filt")
    back = _read(spark, db, "filt", numpartitions=3)
    for cond in [
        F.col("k") == 17,
        F.col("x") > 150.0,
        F.col("name").startswith("name1"),
        F.col("name").contains("ame3"),
        F.col("grp").isNull(),
        F.col("grp").isNotNull() & (F.col("k") <= 50),
        F.col("k").isin(3, 5, 250),
    ]:
        got = sorted(r.k for r in back.filter(cond).collect())
        want = sorted(r.k for r in df.filter(cond).collect())
        assert got == want, str(cond)


def test_sql_of_unit():
    from pyspark.sql.datasource import (
        EqualTo,
        In,
        IsNull,
        LessThanOrEqual,
        StringStartsWith,
    )

    schema = StructType.fromDDL("k long, s string")
    r = sq.SQLiteReader(
        {"dbpath": "/x.db", "dbtable": "t"}, schema
    )
    assert r._sql_of(EqualTo(("k",), 5)) == ('"k" = ?', (5,))
    assert r._sql_of(LessThanOrEqual(("k",), 9)) == ('"k" <= ?', (9,))
    sql, params = r._sql_of(In(("k",), (1, 2)))
    assert sql == '"k" IN (?, ?)' and set(params) == {1, 2}
    assert r._sql_of(IsNull(("s",))) == ('"s" IS NULL', ())
    # string patterns compile byte-exact via substr (NOT LIKE: LIKE
    # is ASCII case-insensitive, which over-includes — unsafe under
    # Not); wildcards in the needle are plain bytes, nothing to escape
    sql, params = r._sql_of(StringStartsWith(("s",), "a%b_c"))
    assert sql == 'substr("s", 1, 5) = ?' and params == ("a%b_c",)
    # unknown column -> not compiled
    assert r._sql_of(EqualTo(("nope",), 1)) is None


def test_decimal_range_predicates_not_pushed_and_correct(spark, tmp_path):
    """ADVICE r6 (high): decimals are stored as TEXT, where '9.00' >
    '10.00' lexicographically — pushing range comparisons silently
    dropped rows Spark never re-checked. Ranges must compile to None
    (source returns the superset; Spark filters exactly)."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        In,
        LessThan,
        LessThanOrEqual,
    )

    schema = StructType.fromDDL("k long, dec decimal(12,2)")
    r = sq.SQLiteReader({"dbpath": "/x.db", "dbtable": "t"}, schema)
    for f in [
        LessThan(("dec",), Decimal("10.00")),
        LessThanOrEqual(("dec",), Decimal("10.00")),
        GreaterThan(("dec",), Decimal("2.00")),
    ]:
        assert r._sql_of(f) is None, f
    # nonzero equality is representation-stable per fixed-scale column
    assert r._sql_of(EqualTo(("dec",), Decimal("9.00"))) == (
        '"dec" = ?',
        ("9.00",),
    )
    # ... but zero is not: '0.00' vs '-0.00' are equal numbers with
    # distinct texts, so zero-valued literals never push
    assert r._sql_of(EqualTo(("dec",), Decimal("0.00"))) is None
    assert r._sql_of(In(("dec",), (Decimal("0.00"), Decimal("1.00")))) is None

    # end-to-end: the exact ADVICE repro — dec < 10.00 must keep 9.00
    db = _db(tmp_path)
    df = spark.createDataFrame(
        [(1, Decimal("9.00")), (2, Decimal("10.00")), (3, Decimal("123.45")),
         (4, Decimal("-0.00")), (5, None)],
        "k long, dec decimal(12,2)",
    )
    _write(df, db, "decs")
    back = _read(spark, db, "decs")
    for cond in [
        F.col("dec") < Decimal("10.00"),
        F.col("dec") >= Decimal("9.50"),
        F.col("dec") == Decimal("0.00"),  # must match the -0.00 row
        F.col("dec").isin(Decimal("9.00"), Decimal("0.00")),
    ]:
        got = sorted(r.k for r in back.filter(cond).collect())
        want = sorted(r.k for r in df.filter(cond).collect())
        assert got == want, str(cond)


def test_not_over_string_patterns_stays_case_sensitive(spark, tmp_path):
    """ADVICE r6 (medium): the old LIKE compile was ASCII
    case-insensitive (over-inclusive — harmless bare, row-dropping
    under Not). substr/instr compiles are byte-exact, so NOT keeps
    rows that differ only by case."""
    from pyspark.sql.datasource import (
        Not,
        StringContains,
        StringEndsWith,
        StringStartsWith,
    )

    schema = StructType.fromDDL("k long, s string")
    r = sq.SQLiteReader({"dbpath": "/x.db", "dbtable": "t"}, schema)
    assert r._sql_of(Not(StringStartsWith(("s",), "abc"))) == (
        'NOT (substr("s", 1, 3) = ?)',
        ("abc",),
    )
    assert r._sql_of(StringEndsWith(("s",), "xy")) == (
        'substr("s", -2) = ?',
        ("xy",),
    )
    assert r._sql_of(StringContains(("s",), "mid")) == (
        'instr("s", ?) > 0',
        ("mid",),
    )
    # empty needle: Spark keeps every non-null row; substr(col,-0)
    # would return the whole string, so these compile as IS NOT NULL
    assert r._sql_of(StringEndsWith(("s",), "")) == ('"s" IS NOT NULL', ())

    db = _db(tmp_path)
    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "ABCdef"), (3, "zabc"), (4, "defABC"),
         (5, None), (6, "aBc")],
        "k long, s string",
    )
    _write(df, db, "cases")
    back = _read(spark, db, "cases")
    for cond in [
        ~F.col("s").startswith("abc"),  # must keep 'ABCdef' and 'aBc'
        ~F.col("s").contains("abc"),
        ~F.col("s").endswith("ABC"),
        F.col("s").startswith("abc"),
        F.col("s").endswith(""),
    ]:
        got = sorted(r.k for r in back.filter(cond).collect())
        want = sorted(r.k for r in df.filter(cond).collect())
        assert got == want, str(cond)


def test_append_and_overwrite_preserve_other_tables(spark, tmp_path):
    db = _db(tmp_path)
    a = spark.createDataFrame([(1, "x")], "k long, s string")
    b = spark.createDataFrame([(9, 1.5)], "id long, v double")
    _write(a, db, "ta")
    _write(b, db, "tb")
    # overwrite of ta must not touch tb
    _write(a.withColumn("s", F.lit("y")), db, "ta", mode="overwrite")
    assert [r.s for r in _read(spark, db, "ta").collect()] == ["y"]
    assert _read(spark, db, "tb").count() == 1
    # append accumulates
    _write(a, db, "ta", mode="append")
    assert _read(spark, db, "ta").count() == 2


def test_foreign_database_affinity_inference(spark, tmp_path):
    """A database written by some other tool (no _spark_schema):
    declared-type affinity maps to long/double/string/binary."""
    db = _db(tmp_path, "foreign.db")
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE ext (id INTEGER, price REAL, label VARCHAR(20), "
        "payload BLOB)"
    )
    con.executemany(
        "INSERT INTO ext VALUES (?, ?, ?, ?)",
        [(1, 9.5, "a", b"\x01"), (2, None, None, None)],
    )
    con.commit()
    con.close()
    back = _read(spark, db, "ext")
    assert dict(back.dtypes) == {
        "id": "bigint", "price": "double", "label": "string",
        "payload": "binary",
    }
    rows = {r.id: (r.price, r.label) for r in back.collect()}
    assert rows == {1: (9.5, "a"), 2: (None, None)}


def test_identifier_validation(spark, tmp_path):
    db = _db(tmp_path)
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(Exception, match="identifier|invalid"):
        _write(df, db, 'orders"; DROP TABLE x; --')


def test_roundtrip_matches_parquet_aggregate(spark, tmp_path, sf_dir):
    """End-to-end: the registered contract query path — write orders
    to sqlite, partitioned read with pushed predicate, aggregate —
    equals the same aggregate over the original parquet."""
    from ai_fabric_etl_spark.queries.lakehouse_queries import (
        source_sqlite_roundtrip,
    )

    got = source_sqlite_roundtrip(spark, sf_dir)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    want = (
        orders.filter(F.col("o_totalprice") > 50000.0)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias(
                "first_order_date"
            ),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_upsert_merge_keys(spark, tmp_path):
    """INSERT .. ON CONFLICT DO UPDATE semantics (the reference's
    Postgres running-aggregate pattern, process_test_data.py:112-148):
    matched keys update in place, new keys insert."""
    db = _db(tmp_path)
    b1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, s string, n long"
    )
    b1.write.format("sqlite").option("dbpath", db).option(
        "dbtable", "agg"
    ).option("mergekeys", "k").mode("append").save()
    b2 = spark.createDataFrame(
        [(2, "B", 25), (3, "c", 30)], "k long, s string, n long"
    )
    b2.write.format("sqlite").option("dbpath", db).option(
        "dbtable", "agg"
    ).option("mergekeys", "k").mode("append").save()
    got = {r.k: (r.s, r.n) for r in _read(spark, db, "agg").collect()}
    assert got == {1: ("a", 10), 2: ("B", 25), 3: ("c", 30)}
    # mergekeys + overwrite is contradictory
    with pytest.raises(Exception, match="append"):
        b1.write.format("sqlite").option("dbpath", db).option(
            "dbtable", "agg"
        ).option("mergekeys", "k").mode("overwrite").save()
    # unknown merge key column fails fast
    with pytest.raises(Exception, match="not in schema"):
        b1.write.format("sqlite").option("dbpath", db).option(
            "dbtable", "agg"
        ).option("mergekeys", "zz").mode("append").save()


def test_txn_guard_exactly_once(spark, tmp_path):
    """txnappid/txnversion: a replayed commit (same or older version)
    is a no-op — Delta txnAppId semantics against a real database."""
    db = _db(tmp_path)
    df = spark.createDataFrame([(1, 100)], "k long, n long")

    def put(version, n):
        spark.createDataFrame([(1, n)], "k long, n long").write.format(
            "sqlite"
        ).option("dbpath", db).option("dbtable", "state").option(
            "mergekeys", "k"
        ).option("txnappid", "stream-A").option(
            "txnversion", str(version)
        ).mode("append").save()

    put(0, 100)
    put(1, 200)
    put(1, 999)   # replay of epoch 1: ignored
    put(0, 555)   # stale epoch: ignored
    assert [(r.k, r.n) for r in _read(spark, db, "state").collect()] == [
        (1, 200)
    ]
    # a DIFFERENT app's counter is independent
    spark.createDataFrame([(2, 1)], "k long, n long").write.format(
        "sqlite"
    ).option("dbpath", db).option("dbtable", "state").option(
        "mergekeys", "k"
    ).option("txnappid", "stream-B").option("txnversion", "0").mode(
        "append"
    ).save()
    assert _read(spark, db, "state").count() == 2
    del df


def test_streaming_foreachbatch_running_aggregate(spark, tmp_path):
    """Stream -> real-DB running aggregates: foreachBatch folds each
    micro-batch's per-key counts into sqlite via the upsert sink with
    the epoch guard — the reference's Postgres ON CONFLICT streaming
    edge (SURVEY A7) end-to-end, replay-idempotent."""
    import os as _os

    db = _db(tmp_path, "stream.db")
    src_dir = str(tmp_path / "in")
    _os.makedirs(src_dir)
    ckpt = str(tmp_path / "ckpt")
    with open(_os.path.join(src_dir, "f1.txt"), "w") as fh:
        fh.write("a\nb\na\n")
    with open(_os.path.join(src_dir, "f2.txt"), "w") as fh:
        fh.write("b\nc\n")

    def fold(batch, epoch):
        agg = batch.groupBy(F.col("value").alias("k")).agg(
            F.count(F.lit(1)).alias("n")
        )
        # read-modify-write against the CURRENT table: add existing
        existing = (
            batch.sparkSession.read.format("sqlite")
            .option("dbpath", db).option("dbtable", "counts").load()
            if _os.path.exists(db)
            else None
        )
        if existing is not None:
            agg = (
                agg.join(existing.withColumnRenamed("n", "prev"), "k", "left")
                .select("k", (F.col("n") + F.coalesce("prev", F.lit(0)))
                        .alias("n"))
            )
        agg.write.format("sqlite").option("dbpath", db).option(
            "dbtable", "counts"
        ).option("mergekeys", "k").option("txnappid", "counts-stream").option(
            "txnversion", str(epoch)
        ).mode("append").save()

    q = (
        spark.readStream.format("text").load(src_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.k: r.n for r in _read(spark, db, "counts").collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_streaming_read_rowid_watermark(spark, tmp_path):
    """readStream.format('sqlite'): append-only table ingested
    incrementally by rowid offset — rows existing at start arrive in
    batch 0, rows appended later arrive exactly once in a later batch."""
    db = _db(tmp_path, "feed.db")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt_sq")

    def append(rows):
        spark.createDataFrame(rows, "k long, s string").write.format(
            "sqlite"
        ).option("dbpath", db).option("dbtable", "feed").mode("append").save()

    append([(1, "a"), (2, "b")])

    def run_available_now():
        q = (
            spark.readStream.format("sqlite")
            .option("dbpath", db).option("dbtable", "feed")
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available_now()
    got = spark.read.parquet(out_dir)
    assert sorted((r.k, r.s) for r in got.collect()) == [(1, "a"), (2, "b")]

    # new rows appended after the first run: ONLY they arrive next
    append([(3, "c")])
    run_available_now()
    got2 = spark.read.parquet(out_dir)
    assert sorted((r.k, r.s) for r in got2.collect()) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    # re-running with nothing new appends nothing (exactly-once)
    run_available_now()
    assert spark.read.parquet(out_dir).count() == 3


def test_not_and_nullsafe_pushdown(spark, tmp_path):
    from pyspark.sql.datasource import EqualNullSafe, EqualTo, Not

    schema = StructType.fromDDL("k long, s string")
    r = sq.SQLiteReader({"dbpath": "/x.db", "dbtable": "t"}, schema)
    assert r._sql_of(Not(EqualTo(("k",), 5))) == ('NOT ("k" = ?)', (5,))
    assert r._sql_of(EqualNullSafe(("s",), None)) == ('"s" IS NULL', ())
    assert r._sql_of(EqualNullSafe(("s",), "x")) == ('"s" IS ?', ("x",))
    # unsupported inner -> Not not compiled either
    assert r._sql_of(Not(EqualTo(("zz",), 1))) is None

    # end-to-end: results identical with the filters pushed
    db = _db(tmp_path, "neg.db")
    df = spark.createDataFrame(
        [(i, None if i % 4 == 0 else f"s{i % 3}") for i in range(40)],
        "k long, s string",
    )
    _write(df, db, "neg")
    back = _read(spark, db, "neg", numpartitions=2)
    for cond in [~(F.col("k") == 7), F.col("s").eqNullSafe("s1"),
                 F.col("s").eqNullSafe(F.lit(None).cast("string")),
                 ~F.col("s").startswith("s2")]:
        got = sorted(r.k for r in back.filter(cond).collect())
        want = sorted(r.k for r in df.filter(cond).collect())
        assert got == want, str(cond)

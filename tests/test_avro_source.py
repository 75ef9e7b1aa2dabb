"""Avro connector (sources/avro_datasource.py): the binary format is
pinned against the Avro 1.11 specification's own encoding examples
(no independent Avro implementation exists in this sandbox, so the
spec's published byte vectors are the interop authority), plus
container round trips through Spark for every supported logical type,
both codecs, append/overwrite modes, and staging invisibility."""

from __future__ import annotations

import datetime
import io
import json
import os
import zlib
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ai_fabric_etl_spark.sources import avro_datasource as av


@pytest.fixture(autouse=True)
def _register(spark):
    av.register(spark)


def _enc_bytes(dt_ddl: str, value, nullable=False) -> bytes:
    field = StructType.fromDDL(f"x {dt_ddl}").fields[0]
    enc = av._encoder(field.dataType, nullable)
    out = io.BytesIO()
    enc(out, value)
    return out.getvalue()


def test_spec_byte_vectors():
    """Exact bytes from the Avro 1.11 spec, 'Binary Encoding':
    zigzag varint longs (0->00, -1->01, 1->02, ..., -64->7f,
    64->80 01), length-prefixed UTF-8 strings ('foo' -> 06 66 6f
    6f), little-endian IEEE floats/doubles, 1-byte booleans."""
    assert _enc_bytes("long", 0) == bytes.fromhex("00")
    assert _enc_bytes("long", -1) == bytes.fromhex("01")
    assert _enc_bytes("long", 1) == bytes.fromhex("02")
    assert _enc_bytes("long", -2) == bytes.fromhex("03")
    assert _enc_bytes("long", 2) == bytes.fromhex("04")
    assert _enc_bytes("long", -64) == bytes.fromhex("7f")
    assert _enc_bytes("long", 64) == bytes.fromhex("8001")
    assert _enc_bytes("string", "foo") == bytes.fromhex("06666f6f")
    assert _enc_bytes("boolean", True) == b"\x01"
    assert _enc_bytes("boolean", False) == b"\x00"
    assert _enc_bytes("double", 1.0) == bytes.fromhex("000000000000f03f")
    # nullable union ['null', T]: zigzag branch index prefixes
    assert _enc_bytes("long", None, nullable=True) == b"\x00"
    assert _enc_bytes("long", 1, nullable=True) == bytes.fromhex("0202")
    # array: count block, items, zero terminator (non-null items)
    from pyspark.sql.types import ArrayType, LongType

    out = io.BytesIO()
    av._encoder(ArrayType(LongType(), containsNull=False), False)(out, [3, 27])
    assert out.getvalue() == bytes.fromhex("04063600")
    # DDL arrays default to nullable items -> each item carries its
    # ['null', T] union branch byte
    assert _enc_bytes("array<long>", [3, 27]) == bytes.fromhex(
        "040206023600"
    )
    assert _enc_bytes("array<long>", []) == b"\x00"
    # date: days since unix epoch as zigzag int
    assert _enc_bytes("date", datetime.date(1970, 1, 2)) == b"\x02"
    # decimal: big-endian two's-complement unscaled value as bytes
    assert _enc_bytes("decimal(9,2)", Decimal("1.00")) == bytes.fromhex(
        "0264"
    )  # len 1, 100
    assert _enc_bytes("decimal(9,2)", Decimal("-0.01")) == bytes.fromhex(
        "02ff"
    )  # len 1, -1


def test_decode_handwritten_container():
    """A container file assembled BY HAND from the spec's structure
    (magic, metadata map, sync, [count, size, payload, sync]) for the
    spec's example record {a: long, b: string} decodes correctly —
    the reader is held to the spec, not to our own writer."""
    schema = json.dumps(
        {
            "type": "record",
            "name": "test",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": "string"},
            ],
        }
    ).encode()

    def vlong(n):
        out = io.BytesIO()
        av._write_long(out, n)
        return out.getvalue()

    sync = bytes(range(16))
    payload = (
        vlong(27) + vlong(3) + b"foo"  # {a: 27, b: "foo"}
        + vlong(42) + vlong(3) + b"bar"  # {a: 42, b: "bar"}
    )
    blob = (
        av.MAGIC
        + vlong(2)  # 2 metadata entries
        + vlong(len(b"avro.schema")) + b"avro.schema"
        + vlong(len(schema)) + schema
        + vlong(len(b"avro.codec")) + b"avro.codec"
        + vlong(4) + b"null"
        + vlong(0)  # end of map
        + sync
        + vlong(2) + vlong(len(payload)) + payload + sync
    )
    path = "/tmp/handmade.avro"
    with open(path, "wb") as f:
        f.write(blob)
    spark_schema = av.read_file_schema(path)
    assert spark_schema.simpleString() == "struct<a:bigint,b:string>"
    rows = list(av._iter_file_rows(path, spark_schema))
    assert rows == [(27, "foo"), (42, "bar")]


def test_roundtrip_all_types_exact(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "héllo wörld", 3.14, 2.5, Decimal("12345.67"),
             datetime.date(2024, 2, 29),
             datetime.datetime(2024, 1, 1, 12, 30, 0, 123456),
             bytearray(b"\x00\xff\x7f"), [1.5, -2.5, 0.0], True),
            (2, None, None, None, Decimal("-0.01"), None, None, None,
             [], False),
            (3, "", float("inf"), -0.0, None,
             datetime.date(1969, 12, 31), None, bytearray(b""), None,
             None),
        ],
        "k long, s string, d double, f float, dec decimal(12,2), "
        "dt date, ts timestamp_ntz, bin binary, arr array<float>, "
        "b boolean",
    )
    out = str(tmp_path / "rt")
    df.repartition(2).write.format("pyavro").mode("overwrite").save(out)
    back = spark.read.format("pyavro").load(out)
    assert back.schema == df.schema
    got = {r.k: r for r in back.collect()}
    want = {r.k: r for r in df.collect()}
    assert got == want


def test_append_and_overwrite_modes(spark, tmp_path):
    out = str(tmp_path / "modes")
    a = spark.range(10).select(F.col("id").alias("k"))
    a.write.format("pyavro").mode("overwrite").save(out)
    a.write.format("pyavro").mode("append").save(out)
    assert spark.read.format("pyavro").load(out).count() == 20
    spark.range(3).select(F.col("id").alias("k")).write.format(
        "pyavro"
    ).mode("overwrite").save(out)
    assert spark.read.format("pyavro").load(out).count() == 3
    # no staging residue after commits
    assert not [n for n in os.listdir(out) if n.startswith("_staging")]
    # overwrite leaves exactly ONE generation dir + the pointer
    gens = [n for n in os.listdir(out) if n.startswith("gen-")]
    assert len(gens) == 1
    assert open(os.path.join(out, "_CURRENT")).read().strip() == gens[0]


def test_codecs_and_block_structure(spark, tmp_path):
    df = spark.range(5000).select(
        F.col("id").alias("k"), F.repeat(F.lit("z"), 100).alias("pad")
    )
    for codec in ("null", "deflate"):
        out = str(tmp_path / codec)
        df.coalesce(1).write.format("pyavro").option(
            "codec", codec
        ).option("blockrows", "512").mode("overwrite").save(out)
        back = spark.read.format("pyavro").load(out)
        assert back.count() == 5000
        assert back.agg(F.sum("k")).collect()[0][0] == 5000 * 4999 // 2
    # deflate actually compresses the repetitive payload
    size = lambda d: sum(  # noqa: E731
        os.path.getsize(f) for f in av._avro_files(str(tmp_path / d))
    )
    assert size("deflate") < size("null") / 5


def test_deflate_is_raw_deflate_per_spec(spark, tmp_path):
    """spec: the deflate codec writes raw DEFLATE streams WITHOUT
    zlib header/checksum (wbits=-15) — a zlib-wrapped stream would be
    unreadable to other Avro implementations."""
    out = str(tmp_path / "d")
    spark.range(4).select(F.col("id").alias("k")).coalesce(1).write.format(
        "pyavro"
    ).mode("overwrite").save(out)
    f = av._avro_files(out)[0]
    with open(f, "rb") as fh:
        meta, sync = av._read_header(fh)
        cur_rows = av._Cursor(fh.read())
        n = cur_rows.read_long()
        size = cur_rows.read_long()
        block = cur_rows.read_fixed(size)
    assert meta["avro.codec"] == b"deflate"
    assert n == 4
    raw = zlib.decompress(block, -15)  # raises if zlib-wrapped
    assert raw == bytes.fromhex("00020406")  # zigzag 0,1,2,3


def test_unsupported_types_fail_fast(spark, tmp_path):
    df = spark.createDataFrame([({"a": 1},)], "m map<string,int>")
    with pytest.raises(Exception, match="unsupported Spark type"):
        df.write.format("pyavro").mode("overwrite").save(
            str(tmp_path / "bad")
        )


def test_one_partition_per_file(spark, tmp_path):
    out = str(tmp_path / "parts")
    spark.range(100).select(F.col("id").alias("k")).repartition(
        7
    ).write.format("pyavro").mode("overwrite").save(out)
    assert len(av._avro_files(out)) == 7
    back = spark.read.format("pyavro").load(out)
    assert back.rdd.getNumPartitions() == 7
    assert back.count() == 100


# ---------------------------------------------------------------------------
# property fuzz: the codec layer round-trips arbitrary values without
# a Spark session (encoder -> block bytes -> decoder)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
)


def _codec_roundtrip(schema: StructType, rows: list[tuple]) -> list[tuple]:
    encoders = [av._encoder(f.dataType, f.nullable) for f in schema.fields]
    decoders = [av._decoder(f.dataType, f.nullable) for f in schema.fields]
    out = io.BytesIO()
    for row in rows:
        for enc, v in zip(encoders, row):
            enc(out, v)
    cur = av._Cursor(out.getvalue())
    back = [tuple(d(cur) for d in decoders) for _ in rows]
    assert cur.pos == len(cur.buf)  # every byte consumed, no drift
    return back


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.one_of(st.none(), st.text(max_size=40)),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False, width=64),
            ),
            st.one_of(
                st.none(),
                st.lists(
                    st.integers(min_value=-(2**31), max_value=2**31 - 1),
                    max_size=8,
                ),
            ),
        ),
        max_size=20,
    )
)
def test_codec_property_roundtrip(rows):
    schema = StructType(
        [
            StructField("k", LongType(), False),
            StructField("s", StringType(), True),
            StructField("d", DoubleType(), True),
            StructField("a", ArrayType(LongType(), containsNull=False), True),
        ]
    )
    assert _codec_roundtrip(schema, rows) == rows


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_varint_property(n):
    out = io.BytesIO()
    av._write_long(out, n)
    b = out.getvalue()
    assert 1 <= len(b) <= 10
    cur = av._Cursor(b)
    assert cur.read_long() == n and cur.pos == len(b)


def test_mixed_schema_directory_rejected(spark, tmp_path):
    """A directory mixing writer schemas must fail loudly, not decode
    the second file as garbage (binary Avro carries no field tags)."""
    out = str(tmp_path / "mixed")
    spark.range(3).select(F.col("id").alias("k")).write.format(
        "pyavro"
    ).mode("overwrite").save(out)
    spark.range(3).select(
        F.col("id").alias("k"), F.lit("x").alias("s")
    ).write.format("pyavro").mode("append").save(out)
    with pytest.raises(Exception, match="does not match"):
        spark.read.format("pyavro").load(out).collect()


def test_overwrite_commit_is_pointer_swap_atomic(spark, tmp_path):
    """ADVICE r7: overwrite must be transactional — the previous
    generation stays fully listed until the single _CURRENT pointer
    rename. Simulate a crash mid-commit (staged files published into
    the new generation dir, pointer NOT yet swapped): a reader must
    still see the OLD data, complete."""
    out = str(tmp_path / "atomic")
    spark.range(10).select(F.col("id").alias("k")).write.format(
        "pyavro"
    ).mode("overwrite").save(out)
    old_gen = open(os.path.join(out, "_CURRENT")).read().strip()

    # hand-roll the crash window: a new generation dir full of files,
    # no pointer swap — exactly the state between commit's publish
    # loop and its os.replace
    import shutil
    crash_gen = os.path.join(out, "gen-crashed")
    shutil.copytree(os.path.join(out, old_gen), crash_gen)

    back = spark.read.format("pyavro").load(out)
    assert back.count() == 10  # old generation, complete — not 20, not 0

    # legacy flat layout (no pointer) still reads
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for n in os.listdir(os.path.join(out, old_gen)):
        shutil.copy(os.path.join(out, old_gen, n), os.path.join(flat, n))
    assert spark.read.format("pyavro").load(flat).count() == 10

    # append into a pointer layout lands in the CURRENT generation
    spark.range(5).select(F.col("id").alias("k")).write.format(
        "pyavro"
    ).mode("append").save(out)
    assert spark.read.format("pyavro").load(out).count() == 15
    assert open(os.path.join(out, "_CURRENT")).read().strip() == old_gen

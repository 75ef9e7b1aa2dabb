"""WebDataset tar-shard export/import (sources/webdataset.py):
deterministic byte-reproducible shards, member pairing, metadata
round trip, and shard-assignment stability."""

from __future__ import annotations

import hashlib
import json
import os
import tarfile

from pyspark.sql import functions as F

from ai_fabric_etl_spark.sources import webdataset as wds


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "héllo wörld", "en", "web"),
            (2, "", "de", "book"),
            (3, "tab\tand\nnewline", "en", "web"),
            (42, "z" * 1000, None, "code"),
            (5, None, "fr", "web"),  # null text -> empty payload
        ],
        "doc_id long, text string, lang string, source string",
    )


def test_export_bytes_are_deterministic(spark, tmp_path):
    """Two exports of the same data produce byte-identical tars
    (members key-sorted, zeroed timestamps/owners) — the property
    that makes shards content-addressable and task retries
    idempotent."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (a, b):
        wds.write_webdataset(
            _docs(spark), out, n_shards=3, meta_cols=["lang", "source"]
        ).count()
    digest = lambda d: {  # noqa: E731
        n: hashlib.sha256(
            open(os.path.join(d, n), "rb").read()
        ).hexdigest()
        for n in sorted(os.listdir(d))
    }
    da, db = digest(a), digest(b)
    assert da == db and len(da) >= 1


def test_members_and_meta_roundtrip(spark, tmp_path):
    out = str(tmp_path / "w")
    manifest = wds.write_webdataset(
        _docs(spark), out, n_shards=2, meta_cols=["lang", "source"]
    ).collect()
    assert sum(m.n_docs for m in manifest) == 5
    back = wds.read_webdataset(spark, out).collect()
    by_key = {r.key: r for r in back}
    assert set(by_key) == {"1", "2", "3", "42", "5"}
    assert by_key["1"].text == "héllo wörld"
    assert by_key["3"].text == "tab\tand\nnewline"
    assert by_key["5"].text == ""  # null text exported as empty
    meta = json.loads(by_key["42"].meta)
    assert meta == {"lang": None, "source": "code"}
    # shard column matches the deterministic assignment
    assign = {
        r.doc_id: r.s
        for r in _docs(spark)
        .select("doc_id", wds.shard_of(F.col("doc_id"), 2).alias("s"))
        .collect()
    }
    for r in back:
        assert r.shard == assign[int(r.key)], r


def test_tar_members_sorted_and_normalized(spark, tmp_path):
    out = str(tmp_path / "n")
    wds.write_webdataset(
        _docs(spark), out, n_shards=1, meta_cols=["lang"]
    ).count()
    [name] = os.listdir(out)
    assert name == "shard-00000.tar"
    with tarfile.open(os.path.join(out, name)) as tar:
        members = tar.getmembers()
        keys = [m.name.split(".")[0] for m in members]
        assert keys == sorted(keys)  # key-sorted, .txt before .json per key
        for m in members:
            assert m.mtime == 0 and m.uid == 0 and m.mode == 0o644


def test_shard_assignment_matches_sql_twin(spark):
    """shard_of (Spark conv/md5) and shard_of_sql (DuckDB) agree for
    every doc — the property the export_wds_roundtrip oracle rides."""
    import duckdb

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    got = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", wds.shard_of(F.col("doc_id"), 8).alias("s")
        ).collect()
    }
    want = dict(
        duckdb.connect()
        .execute(
            f"SELECT doc_id, {wds.shard_of_sql('doc_id', 8)} "
            "FROM (SELECT unnest(range(500)) AS doc_id)"
        )
        .fetchall()
    )
    assert got == want


def test_keys_with_dots_rejected(spark, tmp_path):
    import pytest

    df = spark.createDataFrame(
        [("a.b", "x")], "doc_id string, text string"
    )
    with pytest.raises(Exception, match="must not contain"):
        wds.write_webdataset(df, str(tmp_path / "bad"), n_shards=1).count()

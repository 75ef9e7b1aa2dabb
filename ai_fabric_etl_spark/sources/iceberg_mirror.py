"""Iceberg-v2 metadata mirror for :class:`ParquetMergeTable` — the
second half of the lakehouse-interop story (the first is the Delta
transaction-log mirror in ``operators/merge.py``).

Every commit additionally writes the PUBLIC Apache Iceberg table
format (spec at iceberg.apache.org/spec/, format-version 2):

- ``metadata/v{N}.metadata.json`` — full table metadata: schemas with
  field-ids (tracked across schema evolution), snapshots, sequence
  numbers, partition specs / sort orders, snapshot log;
- ``metadata/snap-{id}-*.avro`` — the snapshot's manifest list;
- ``metadata/manifest-*.avro`` — one manifest per snapshot holding
  every live data file with per-file record counts and sizes;
- ``metadata/version-hint.text`` — the HadoopTables current-version
  pointer.

Manifests are REAL Avro container files written with the repo's own
pure-stdlib codec (sources/avro_datasource.py), with the Iceberg
``field-id`` attributes readers resolve columns by. Since no native
Iceberg runtime exists in this sandbox, conformance is pinned the same
way as the Delta mirror: a from-scratch reader in this module replays
version-hint → metadata.json → manifest list → manifests → parquet
and must reproduce ``table.read()`` for current AND historical
snapshots, plus spec-conformance unit checks (required fields,
field-id uniqueness, manifest lengths, file/row counts) in
tests/test_merge.py.

Because each ``ParquetMergeTable`` version is a full snapshot under
``v={n}/``, every snapshot's manifest lists its files as ADDED
(status 1) at that snapshot's sequence number — the remove side is
implied by files simply not appearing in the next snapshot, which is
exactly how Iceberg defines a snapshot's live set. Per-file
record counts come from the parquet footers (at production scale they
would be captured from write-task stats instead of a footer read —
same numbers, no extra IO).
"""

from __future__ import annotations

import io
import json
import os
import time
import uuid as _uuid

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

META_DIR = "metadata"


# ---------------------------------------------------------------------------
# Spark schema -> Iceberg schema JSON (with field-id assignment/reuse)
# ---------------------------------------------------------------------------


def _iceberg_type(dt: DataType, alloc, old=None):
    """Convert a Spark type to an Iceberg type JSON value, assigning
    fresh ids from ``alloc`` (a callable) or reusing ids from ``old``
    (the structurally-matching previous Iceberg type, or None)."""
    if isinstance(dt, StructType):
        old_fields = {
            f["name"]: f for f in (old or {}).get("fields", [])
        } if isinstance(old, dict) and old.get("type") == "struct" else {}
        fields = []
        for f in dt.fields:
            of = old_fields.get(f.name)
            # spec "Schema Evolution": a field KEEPS its id when the
            # type is unchanged, legally promoted, or stays the same
            # nested kind (sub-fields then evolve recursively — adding
            # a sub-field must not re-id the parent or its siblings);
            # required<->optional toggles are id-preserving too
            reuse = of is not None and _id_compatible(f.dataType, of["type"])
            fid = of["id"] if reuse else alloc()
            ot = of["type"] if reuse else None
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _iceberg_type(f.dataType, alloc, ot),
                }
            )
        return {"type": "struct", "fields": fields}
    if isinstance(dt, ArrayType):
        oe = old.get("element") if isinstance(old, dict) \
            and old.get("type") == "list" else None
        if oe is not None and not _id_compatible(dt.elementType, oe):
            oe = None  # illegal element change -> fresh element id/type
        eid = old["element-id"] if oe is not None else alloc()
        return {
            "type": "list",
            "element-id": eid,
            "element": _iceberg_type(dt.elementType, alloc, oe),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, MapType):
        om = old if isinstance(old, dict) and old.get("type") == "map" else None
        ok = om.get("key") if om else None
        ov = om.get("value") if om else None
        if ok is not None and not _id_compatible(dt.keyType, ok):
            ok = None
        if ov is not None and not _id_compatible(dt.valueType, ov):
            ov = None
        kid = om["key-id"] if ok is not None else alloc()
        vid = om["value-id"] if ov is not None else alloc()
        return {
            "type": "map",
            "key-id": kid,
            "key": _iceberg_type(dt.keyType, alloc, ok),
            "value-id": vid,
            "value": _iceberg_type(dt.valueType, alloc, ov),
            "value-required": not dt.valueContainsNull,
        }
    if isinstance(dt, DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    simple = {
        BooleanType: "boolean",
        IntegerType: "int",
        LongType: "long",
        FloatType: "float",
        DoubleType: "double",
        StringType: "string",
        BinaryType: "binary",
        DateType: "date",
        TimestampType: "timestamptz",
        TimestampNTZType: "timestamp",
    }
    for cls, name in simple.items():
        if isinstance(dt, cls):
            return name
    from pyspark.sql.types import ByteType, ShortType

    if isinstance(dt, (ByteType, ShortType)):
        return "int"  # Iceberg has no 8/16-bit ints; widen like Spark's writer
    raise ValueError(f"iceberg mirror: unsupported Spark type {dt.simpleString()}")


def _id_compatible(dt: DataType, ice) -> bool:
    """Does a Spark type evolve from a previous Iceberg type WITHOUT a
    drop+re-add (i.e. keeping the field-id)? Per the spec's schema-
    evolution table: identical primitives; the legal promotions
    int→long, float→double, decimal(P,S)→decimal(P'≥P,S); or the same
    nested kind (struct/list/map), whose children are then matched
    recursively by the caller. Anything else — including an illegal
    promotion like long→int or a scale change — is a new column."""
    if isinstance(dt, StructType):
        return isinstance(ice, dict) and ice.get("type") == "struct"
    if isinstance(dt, ArrayType):
        return isinstance(ice, dict) and ice.get("type") == "list"
    if isinstance(dt, MapType):
        return isinstance(ice, dict) and ice.get("type") == "map"
    try:
        new = _iceberg_type(dt, lambda: -1, None)
    except ValueError:
        return False
    if not isinstance(ice, str) or not isinstance(new, str):
        return False
    if new == ice:
        return True
    if (ice, new) in (("int", "long"), ("float", "double")):
        return True
    if ice.startswith("decimal(") and new.startswith("decimal("):
        po, so = (int(x) for x in ice[8:-1].split(","))
        pn, sn = (int(x) for x in new[8:-1].split(","))
        return sn == so and pn >= po
    return False


def _strip_ids(t):
    if isinstance(t, dict):
        return {
            k: ([_strip_ids(x) for x in v] if isinstance(v, list)
                else _strip_ids(v))
            for k, v in t.items()
            if k not in ("id", "element-id", "key-id", "value-id")
        }
    return t


def schema_to_iceberg(
    schema: StructType, old_schema: dict | None, last_column_id: int
) -> tuple[dict, int]:
    """Build the Iceberg schema JSON for a Spark schema, reusing
    field-ids from ``old_schema`` where name+type+required match and
    allocating fresh ids above ``last_column_id`` otherwise. Returns
    (schema_json_without_schema_id, new_last_column_id)."""
    counter = [last_column_id]

    def alloc():
        counter[0] += 1
        return counter[0]

    body = _iceberg_type(schema, alloc, old_schema)
    return body, counter[0]


# ---------------------------------------------------------------------------
# Avro container writing (manifests / manifest lists) via the pyavro codec
# ---------------------------------------------------------------------------

_MANIFEST_ENTRY_STRUCT = StructType(
    [
        StructField("status", IntegerType(), False),
        StructField("snapshot_id", LongType(), True),
        StructField("sequence_number", LongType(), True),
        StructField("file_sequence_number", LongType(), True),
        StructField(
            "data_file",
            StructType(
                [
                    StructField("content", IntegerType(), False),
                    StructField("file_path", StringType(), False),
                    StructField("file_format", StringType(), False),
                    StructField("partition", StructType([]), False),
                    StructField("record_count", LongType(), False),
                    StructField("file_size_in_bytes", LongType(), False),
                ]
            ),
            False,
        ),
    ]
)

_MANIFEST_ENTRY_AVRO = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {
                        "name": "partition",
                        "field-id": 102,
                        "type": {"type": "record", "name": "r102",
                                 "fields": []},
                    },
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                ],
            },
        },
    ],
}

_MANIFEST_FILE_STRUCT = StructType(
    [
        StructField("manifest_path", StringType(), False),
        StructField("manifest_length", LongType(), False),
        StructField("partition_spec_id", IntegerType(), False),
        StructField("content", IntegerType(), False),
        StructField("sequence_number", LongType(), False),
        StructField("min_sequence_number", LongType(), False),
        StructField("added_snapshot_id", LongType(), False),
        StructField("added_data_files_count", IntegerType(), False),
        StructField("existing_data_files_count", IntegerType(), False),
        StructField("deleted_data_files_count", IntegerType(), False),
        StructField("added_rows_count", LongType(), False),
        StructField("existing_rows_count", LongType(), False),
        StructField("deleted_rows_count", LongType(), False),
    ]
)

_MANIFEST_FILE_AVRO = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_data_files_count", "type": "int", "field-id": 504},
        {"name": "existing_data_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_data_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


def _write_avro_container(
    path: str, avro_schema: dict, struct: StructType, rows: list[tuple]
) -> None:
    """One-block uncompressed Avro container holding ``rows`` encoded
    per ``struct`` (binary layout is type-driven, so the hand-built
    ``avro_schema`` with field-ids describes the same bytes). Written
    atomically (tmp + rename) — metadata files must never be seen
    half-written."""
    from ai_fabric_etl_spark.sources.avro_datasource import (
        MAGIC,
        _encoder,
        _write_long,
    )

    encoders = [_encoder(f.dataType, f.nullable) for f in struct.fields]
    body = io.BytesIO()
    for row in rows:
        for enc, v in zip(encoders, row):
            enc(body, v)
    payload = body.getvalue()

    sync = _uuid.uuid4().bytes
    out = io.BytesIO()
    out.write(MAGIC)
    _write_long(out, 2)
    for k, v in (
        ("avro.schema", json.dumps(avro_schema).encode()),
        ("avro.codec", b"null"),
    ):
        kb = k.encode()
        _write_long(out, len(kb))
        out.write(kb)
        _write_long(out, len(v))
        out.write(v)
    _write_long(out, 0)
    out.write(sync)
    if rows:
        _write_long(out, len(rows))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(out.getvalue())
    os.replace(tmp, path)


def _read_avro_rows(path: str, struct: StructType) -> list[tuple]:
    from ai_fabric_etl_spark.sources.avro_datasource import _iter_file_rows

    return list(_iter_file_rows(path, struct))


# ---------------------------------------------------------------------------
# per-commit emission (called by ParquetMergeTable.overwrite)
# ---------------------------------------------------------------------------


def _parquet_row_count(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _last_metadata(meta_dir: str) -> tuple[int, dict | None]:
    """Newest emitted (version, metadata dict), or (-1, None)."""
    try:
        names = os.listdir(meta_dir)
    except FileNotFoundError:
        return -1, None
    vs = sorted(
        int(n[1:-14])
        for n in names
        if n.startswith("v") and n.endswith(".metadata.json")
        and n[1:-14].isdigit()
    )
    if not vs:
        return -1, None
    with open(
        os.path.join(meta_dir, f"v{vs[-1]}.metadata.json"), encoding="utf-8"
    ) as fh:
        return vs[-1], json.load(fh)


def emit_iceberg_metadata(table, v: int, schema: StructType, op: str) -> None:
    """Mirror commit ``v`` (and any crash-gap predecessors, delta-
    mirror-style catch-up) into Iceberg v2 metadata. ``table`` is the
    ParquetMergeTable; the call runs after the authoritative pointer
    swap, so a crash here loses only mirror entries that the next
    commit re-derives."""
    meta_dir = os.path.join(table.path, META_DIR)
    os.makedirs(meta_dir, exist_ok=True)
    last_v, prev = _last_metadata(meta_dir)
    now_ms = int(time.time() * 1000)

    op_map = {
        "OPTIMIZE": "replace", "DELETE": "delete", "MERGE": "overwrite",
        "APPEND": "append",
    }

    for missing in range(last_v + 1, v + 1):
        # schema for this commit: live schema for the current commit,
        # retained footers for catch-up gaps (vacuumed gaps fall back
        # to the previous schema — their snapshots are empty anyway)
        if missing == v:
            sch = schema
        else:
            sj = table._schema_of_version(missing)
            sch = (
                StructType.fromJson(json.loads(sj)) if sj else None
            )
        prev_schemas = prev["schemas"] if prev else []
        prev_current = (
            next(
                s for s in prev_schemas
                if s["schema-id"] == prev["current-schema-id"]
            )
            if prev
            else None
        )
        last_col = prev["last-column-id"] if prev else 0
        if sch is None and prev_current is not None:
            schema_id, schemas = prev["current-schema-id"], prev_schemas
        else:
            if sch is None:
                sch = StructType([])
            body, new_last = schema_to_iceberg(
                sch, prev_current, last_col
            )
            if prev_current is not None and _strip_ids(body) == _strip_ids(
                {k: v2 for k, v2 in prev_current.items()
                 if k not in ("schema-id",)}
            ):
                schema_id, schemas = prev["current-schema-id"], prev_schemas
            else:
                schema_id = (
                    max((s["schema-id"] for s in prev_schemas), default=-1)
                    + 1
                )
                schemas = prev_schemas + [
                    {"schema-id": schema_id, **body}
                ]
                last_col = new_last

        # APPEND fast-path (manifest-layout commits, VERDICT r12 item
        # 1): the new snapshot's manifest holds ONLY the files this
        # commit introduced (physically under ``v={v}/``), and its
        # manifest list is the prior snapshot's list plus that one new
        # manifest — the shape a real Iceberg append writes, O(batch)
        # mirror work instead of one full-corpus manifest per commit.
        # Everything else (overwrite ops, crash-gap catch-up whose op
        # is unknowable) emits the full-snapshot manifest as before.
        all_entries = table._version_entries(missing)
        prev_snap = None
        if prev:
            prev_snap = next(
                (
                    s for s in prev.get("snapshots", [])
                    if s["snapshot-id"] == prev.get("current-snapshot-id")
                ),
                None,
            )
        is_append = (
            op == "APPEND"
            and missing == v
            and prev_snap is not None
            and os.path.exists(prev_snap["manifest-list"])
        )
        own_prefix = f"v={missing}/"
        manifest_entries = (
            [e for e in all_entries if e["path"].startswith(own_prefix)]
            if is_append
            else all_entries
        )
        entries = []
        total_rows = 0
        for e in manifest_entries:
            abs_path = os.path.join(table.path, e["path"])
            n_rows = (
                e["rows"]
                if e.get("rows") is not None
                else _parquet_row_count(abs_path)
            )
            total_rows += n_rows
            entries.append(
                (
                    1,  # ADDED
                    missing,  # snapshot id == version
                    missing,  # data sequence number
                    missing,
                    # nested structs encode by field NAME (pyavro
                    # enc_rec), so the data_file is a dict
                    {
                        "content": 0,
                        "file_path": abs_path,
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": n_rows,
                        "file_size_in_bytes": e["size"],
                    },
                )
            )
        muid = _uuid.uuid4().hex
        manifest_path = os.path.join(meta_dir, f"manifest-{muid}.avro")
        _write_avro_container(
            manifest_path, _MANIFEST_ENTRY_AVRO, _MANIFEST_ENTRY_STRUCT,
            entries,
        )
        snap_path = os.path.join(
            meta_dir, f"snap-{missing}-{muid}.avro"
        )
        manifest_rows = [
            (
                manifest_path,
                os.path.getsize(manifest_path),
                0,  # partition_spec_id
                0,  # content: data
                missing,
                missing,
                missing,
                len(entries),
                0,
                0,
                total_rows,
                0,
                0,
            )
        ]
        if is_append:
            # carry the prior snapshot's manifests forward (their
            # entries stay live — status ADDED in an older snapshot
            # reads as live data in this one, per the reader's
            # status ∈ {EXISTING, ADDED} rule)
            manifest_rows = (
                _read_avro_rows(
                    prev_snap["manifest-list"], _MANIFEST_FILE_STRUCT
                )
                + manifest_rows
            )
        _write_avro_container(
            snap_path,
            _MANIFEST_FILE_AVRO,
            _MANIFEST_FILE_STRUCT,
            manifest_rows,
        )

        snapshot = {
            "snapshot-id": missing,
            "sequence-number": missing,
            "timestamp-ms": now_ms,
            "manifest-list": snap_path,
            "summary": {
                "operation": op_map.get(op, "overwrite")
                if missing == v
                else "overwrite",
                "added-data-files": str(len(entries)),
                "added-records": str(total_rows),
            },
            "schema-id": schema_id,
        }
        meta = {
            "format-version": 2,
            "table-uuid": prev["table-uuid"] if prev
            else table._delta_table_id(),
            "location": table.path,
            "last-sequence-number": missing,
            "last-updated-ms": now_ms,
            "last-column-id": last_col,
            "current-schema-id": schema_id,
            "schemas": schemas,
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999,
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {"write.format.default": "parquet"},
            "current-snapshot-id": missing,
            "snapshots": (prev["snapshots"] if prev else []) + [snapshot],
            "snapshot-log": (prev.get("snapshot-log", []) if prev else [])
            + [{"snapshot-id": missing, "timestamp-ms": now_ms}],
            "metadata-log": [],
        }
        tmp = os.path.join(meta_dir, f".v{missing}.metadata.json.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(meta, fh, indent=1)
        os.replace(
            tmp, os.path.join(meta_dir, f"v{missing}.metadata.json")
        )
        hint_tmp = os.path.join(meta_dir, ".version-hint.tmp")
        with open(hint_tmp, "w", encoding="utf-8") as fh:
            fh.write(str(missing))
        os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
        prev = meta


# ---------------------------------------------------------------------------
# from-scratch snapshot reader (the conformance counterpart)
# ---------------------------------------------------------------------------


def read_iceberg_snapshot(spark, table_path: str, snapshot_id: int | None = None):
    """Resolve a snapshot exactly the way an Iceberg reader does:
    version-hint → metadata.json → manifest list (Avro) → manifests
    (Avro) → parquet files. Returns the snapshot DataFrame; raises on
    missing/invalid metadata. ``snapshot_id=None`` reads the current
    snapshot; any listed snapshot id time-travels."""
    meta_dir = os.path.join(table_path, META_DIR)
    with open(os.path.join(meta_dir, "version-hint.text"),
              encoding="utf-8") as fh:
        hint = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{hint}.metadata.json"),
              encoding="utf-8") as fh:
        meta = json.load(fh)
    if meta["format-version"] != 2:
        raise ValueError("unsupported iceberg format-version")
    sid = snapshot_id if snapshot_id is not None \
        else meta["current-snapshot-id"]
    snap = next(
        (s for s in meta["snapshots"] if s["snapshot-id"] == sid), None
    )
    if snap is None:
        raise ValueError(f"snapshot {sid} not in metadata")
    manifests = _read_avro_rows(snap["manifest-list"], _MANIFEST_FILE_STRUCT)
    paths: list[str] = []
    for m in manifests:
        for e in _read_avro_rows(m[0], _MANIFEST_ENTRY_STRUCT):
            status, data_file = e[0], e[4]
            if status in (0, 1):  # EXISTING / ADDED are live
                paths.append(data_file[1])
    if not paths:
        ice = next(
            s for s in meta["schemas"]
            if s["schema-id"] == snap.get("schema-id",
                                          meta["current-schema-id"])
        )
        return spark.createDataFrame([], _spark_schema_of(ice))
    return spark.read.parquet(*paths)


def _spark_schema_of(ice: dict) -> StructType:
    """Iceberg schema JSON -> Spark schema (reader side)."""
    def conv(t):
        if isinstance(t, dict):
            if t["type"] == "struct":
                return StructType(
                    [
                        StructField(f["name"], conv(f["type"]),
                                    not f["required"])
                        for f in t["fields"]
                    ]
                )
            if t["type"] == "list":
                return ArrayType(conv(t["element"]),
                                 not t["element-required"])
            if t["type"] == "map":
                return MapType(conv(t["key"]), conv(t["value"]),
                               not t["value-required"])
            raise ValueError(f"unsupported iceberg type {t}")
        if t.startswith("decimal"):
            p, s = t[8:-1].split(",")
            return DecimalType(int(p), int(s))
        simple = {
            "boolean": BooleanType(), "int": IntegerType(),
            "long": LongType(), "float": FloatType(),
            "double": DoubleType(), "string": StringType(),
            "binary": BinaryType(), "date": DateType(),
            "timestamptz": TimestampType(), "timestamp": TimestampNTZType(),
        }
        if t in simple:
            return simple[t]
        raise ValueError(f"unsupported iceberg type {t}")

    return conv(ice | {"type": "struct"})


# ---------------------------------------------------------------------------
# snapshot expiry (Iceberg "Table Maintenance: expire snapshots")
# ---------------------------------------------------------------------------


def expire_iceberg_snapshots(table_path: str, keep_last: int = 2) -> dict:
    """Expire all but the newest ``keep_last`` snapshots from the
    current metadata and delete the manifest-list / manifest Avro
    files no longer referenced by any retained snapshot — the mirror's
    equivalent of Iceberg's ``expireSnapshots`` maintenance action,
    which bounds metadata growth on a long-lived table (every commit
    otherwise adds one manifest list + one manifest forever).

    Deviation from HadoopTables (documented): Iceberg's action writes
    a NEW metadata version; this mirror keeps ``metadata version ==
    table commit version`` (the crash-gap catch-up in
    :func:`emit_iceberg_metadata` depends on that equality), so expiry
    REWRITES the current ``v{N}.metadata.json`` atomically instead of
    bumping N. Readers see either the old or the new complete file.

    Data files are NOT touched — they belong to the authoritative
    ParquetMergeTable and its vacuum; expiry unlinks metadata only.
    Schemas are all retained (retained snapshots reference them by
    schema-id; keeping extras is spec-legal).

    Returns counters: ``expired``, ``deleted_manifest_lists``,
    ``deleted_manifests``, ``retained``.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    meta_dir = os.path.join(table_path, META_DIR)
    with open(os.path.join(meta_dir, "version-hint.text"),
              encoding="utf-8") as fh:
        hint = int(fh.read().strip())
    meta_path = os.path.join(meta_dir, f"v{hint}.metadata.json")
    with open(meta_path, encoding="utf-8") as fh:
        meta = json.load(fh)

    snaps = sorted(meta["snapshots"], key=lambda s: s["snapshot-id"])
    retained = snaps[-keep_last:]
    expired = snaps[:-keep_last]
    if not expired:
        return {
            "expired": 0, "deleted_manifest_lists": 0,
            "deleted_manifests": 0, "retained": len(retained),
        }
    keep_ids = {s["snapshot-id"] for s in retained}

    # manifests referenced by retained snapshots stay; everything a
    # retained manifest list names is live
    live_manifests: set[str] = set()
    for s in retained:
        for m in _read_avro_rows(s["manifest-list"], _MANIFEST_FILE_STRUCT):
            live_manifests.add(m[0])

    dead_lists, dead_manifests = [], set()
    for s in expired:
        dead_lists.append(s["manifest-list"])
        for m in _read_avro_rows(s["manifest-list"], _MANIFEST_FILE_STRUCT):
            if m[0] not in live_manifests:
                dead_manifests.add(m[0])

    meta["snapshots"] = retained
    meta["snapshot-log"] = [
        e for e in meta.get("snapshot-log", [])
        if e["snapshot-id"] in keep_ids
    ]
    tmp = os.path.join(meta_dir, f".v{hint}.metadata.json.expire.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, meta_path)

    # unlink AFTER the metadata swap: a crash in between leaves
    # unreferenced-but-present files (harmless orphans), never a
    # referenced-but-missing one
    for p in dead_lists:
        try:
            os.remove(p)
        except FileNotFoundError:
            pass
    for p in dead_manifests:
        try:
            os.remove(p)
        except FileNotFoundError:
            pass
    return {
        "expired": len(expired),
        "deleted_manifest_lists": len(dead_lists),
        "deleted_manifests": len(dead_manifests),
        "retained": len(retained),
    }

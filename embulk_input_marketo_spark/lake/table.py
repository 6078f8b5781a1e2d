"""Snapshot-isolated, hash-bucketed Parquet lake table (Iceberg-style, from
scratch — no Iceberg jars ship in this environment).

Design, chosen for 100 TB / 1000-executor scale:

- Data files are bucketed by ``pmod(xxhash64(key), n_buckets)``. A CDC merge
  touches only the buckets its batch keys hash into → bucket pruning bounds
  the copy-on-write rewrite to ``|touched buckets| / n_buckets`` of the table,
  and the merge join is key-colocated by construction.
- A snapshot manifest (JSON) lists every live data file per bucket, the schema
  history, applied batch ids, and the checkpoint/high-water mark. Commit =
  write manifest, fsync, atomically swap a ``_current`` pointer (os.rename).
  On a real deployment the pointer swap is a catalog CAS (Hive/Glue/Nessie);
  the protocol is identical.
- **Data + state commit atomically together**: the checkpoint (the reference's
  ``ConfigDiff``, ``MarketoBaseBulkExtractInputPlugin.buildConfigDiff:126-137``)
  and the applied-batch manifest live INSIDE the snapshot manifest, so there is
  no cross-table transaction problem: a batch is either fully applied (data
  files + hwm + batch_id all visible) or not at all. Re-running an applied
  batch is a no-op (idempotence key = batch_id). The reference cannot do this
  ("Resume supported: no", README.md:25).
- Schema evolution is column-id-free but version-mapped: each data file
  records the schema_version it was written under; the manifest keeps the full
  schema history plus a rename log. Reads group files by schema_version, apply
  renames and Iceberg-legal casts (int→long, float→double), and union — old
  files are never rewritten for a schema change
  (mirrors the per-run re-describe at ``LeadBulkExtractInputPlugin.java:55-63``).

Single-writer is assumed (the replay orchestrator is the one writer), matching
the reference's single-transaction model; concurrent writers would need the
catalog CAS noted above.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPE_ALIASES = {"integer": "int", "bigint": "long", "long": "long"}


def _norm_type_name(n: str) -> str:
    return _TYPE_ALIASES.get(n, n)


# Iceberg-legal promotions only (no data rewrite required)
_PROMOTIONS = {
    ("int", "long"),
    ("float", "double"),
    ("date", "timestamp"),
}


def bucket_expr(key_col: str, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


# Internal columns stored in every data file alongside the user schema:
#   _lsn     long    LWW minor order key (unique, monotone)
#   _deleted boolean tombstone marker — deletes are retained WITH their order
#                    key so a late-arriving older update cannot resurrect a
#                    deleted key across batch boundaries; reads filter them,
#                    vacuum_tombstones() reclaims them past a lateness
#                    watermark.
INTERNAL_FIELDS = [
    T.StructField("_lsn", T.LongType(), True),
    T.StructField("_deleted", T.BooleanType(), False),
]


@dataclass
class Manifest:
    version: int
    parent: int | None
    key_col: str
    lww_major: str  # user-schema column that is the LWW major order key
    n_buckets: int
    schema_version: int
    schemas: dict[str, Any]           # schema_version(str) -> StructType json
    renames: list[dict[str, Any]]     # [{"at_sv": 2, "old": "lang", "new": "language"}]
    files: dict[str, list[dict]]      # bucket(str) -> [{"path", "sv", "rows"}]
    applied_batches: list[str]
    checkpoint: dict[str, Any]
    summary: dict[str, Any]
    committed_at: float

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=1, default=str)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        return Manifest(**json.loads(s))

    def current_schema(self) -> T.StructType:
        return T.StructType.fromJson(self.schemas[str(self.schema_version)])


class LakeTable:
    def __init__(self, path: str):
        self.path = path
        self.meta_dir = os.path.join(path, "_meta")
        self.data_dir = os.path.join(path, "data")

    # ---------------------------------------------------------------- create
    @staticmethod
    def create(
        path: str,
        schema: T.StructType,
        key_col: str = "url",
        lww_major: str = "warc_ts",
        n_buckets: int = 64,
    ) -> "LakeTable":
        t = LakeTable(path)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        m = Manifest(
            version=0,
            parent=None,
            key_col=key_col,
            lww_major=lww_major,
            n_buckets=n_buckets,
            schema_version=1,
            schemas={"1": schema.jsonValue()},
            renames=[],
            files={},
            applied_batches=[],
            checkpoint={"hwm_lsn": -1, "hwm_warc_ts": None},
            summary={"operation": "create"},
            committed_at=time.time(),
        )
        t._write_manifest(m)
        return t

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(path, "_meta", "_current"))

    # ------------------------------------------------------------- manifests
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"snap-{version:012d}.json")

    def _write_manifest(self, m: Manifest) -> None:
        mp = self._manifest_path(m.version)
        tmp = mp + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(m.to_json())
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, mp)
        # atomic pointer swap — the commit point
        ptr_tmp = os.path.join(self.meta_dir, f"_current.tmp-{uuid.uuid4().hex}")
        with open(ptr_tmp, "w") as f:
            f.write(str(m.version))
            f.flush()
            os.fsync(f.fileno())
        os.rename(ptr_tmp, os.path.join(self.meta_dir, "_current"))

    def current_version(self) -> int:
        with open(os.path.join(self.meta_dir, "_current")) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> Manifest:
        v = self.current_version() if version is None else version
        with open(self._manifest_path(v)) as f:
            return Manifest.from_json(f.read())

    def history(self) -> list[Manifest]:
        return [self.manifest(v) for v in range(self.current_version() + 1)]

    # ---------------------------------------------------------------- reads
    def _read_raw(
        self,
        spark: SparkSession,
        m: Manifest,
        bucket_keys: set[str],
    ) -> DataFrame:
        """Union all file generations of the given buckets, mapped to the
        current schema + internal columns. May contain multiple versions per
        key (merge-on-read deltas) and tombstones."""
        cur_schema = m.current_schema()
        full_schema = T.StructType(list(cur_schema.fields) + INTERNAL_FIELDS)
        groups: dict[int, list[str]] = {}
        for b, entries in m.files.items():
            if b not in bucket_keys:
                continue
            for e in entries:
                groups.setdefault(int(e["sv"]), []).append(e["path"])
        if not groups:
            return spark.createDataFrame([], full_schema)
        parts: list[DataFrame] = []
        for sv, paths in sorted(groups.items()):
            file_schema = T.StructType(
                list(T.StructType.fromJson(m.schemas[str(sv)]).fields)
                + INTERNAL_FIELDS
            )
            df = spark.read.schema(file_schema).parquet(*paths)
            df = self._map_to_current(df, sv, m, full_schema)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        buckets: list[int] | None = None,
        include_internal: bool = False,
    ) -> DataFrame:
        """Read a snapshot (optionally only some buckets — bucket pruning).

        Merge-on-read: buckets holding delta files from several commits are
        LWW-reduced at read time; buckets with a single (already per-key
        reduced) generation are read directly — no aggregate. Schema
        evolution handled per file generation (rename/cast/pad).

        ``include_internal``: return the raw multi-generation rows with
        ``_lsn``/``_deleted`` — the merge/compaction path's input. Otherwise
        tombstones are filtered and internal columns dropped."""
        from embulk_input_marketo_spark.operators.dedup import lww_dedup

        m = self.manifest(version)
        wanted = (
            {str(b) for b in buckets} if buckets is not None else set(m.files.keys())
        )
        if include_internal:
            return self._read_raw(spark, m, wanted)

        # a bucket can skip the read-time reduce only if it holds a single
        # generation AND that generation was written per-key-reduced
        # (compaction/CoW output). Raw appends (reduced=False) always reduce.
        clean = {
            b for b in wanted
            if len({e.get("v", 0) for e in m.files.get(b, [])}) <= 1
            and all(e.get("reduced", True) for e in m.files.get(b, []))
        }
        dirty = wanted - clean
        out = self._read_raw(spark, m, clean)
        if dirty:
            reduced = lww_dedup(
                self._read_raw(spark, m, dirty),
                key_cols=m.key_col,
                order_cols=[m.lww_major, "_lsn"],
            )
            out = out.unionByName(reduced.select(*out.columns))
        return out.where(~F.col("_deleted")).drop("_lsn", "_deleted")

    def _map_to_current(
        self, df: DataFrame, sv: int, m: Manifest, cur_schema: T.StructType
    ) -> DataFrame:
        # renames recorded after this file generation
        for r in m.renames:
            if int(r["at_sv"]) > sv and r["old"] in df.columns:
                df = df.withColumnRenamed(r["old"], r["new"])
        cols = []
        have = {f.name: f for f in df.schema.fields}
        for f_ in cur_schema.fields:
            if f_.name in have:
                c = F.col(f_.name)
                if have[f_.name].dataType != f_.dataType:
                    c = c.cast(f_.dataType)  # Iceberg-legal promotions only
                cols.append(c.alias(f_.name))
            else:
                cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
        return df.select(*cols)

    # ------------------------------------------------------------ evolution
    def evolve_schema(
        self,
        changes: list[dict[str, Any]],
        summary: dict[str, Any] | None = None,
        checkpoint_update: dict[str, Any] | None = None,
    ) -> Manifest:
        """Apply registry changes: [{'change': 'add', 'name', 'type'},
        {'change': 'rename', 'old', 'new'}, {'change': 'widen', 'name',
        'to_type'}]. Old data files are untouched (metadata-only commit)."""
        m = self.manifest()
        schema = m.current_schema()
        new_sv = m.schema_version + 1
        fields = list(schema.fields)
        renames = list(m.renames)
        for ch in changes:
            kind = ch["change"]
            if kind == "add":
                if any(f.name == ch["name"] for f in fields):
                    continue  # idempotent re-apply
                fields.append(
                    T.StructField(ch["name"], _parse_type(ch["type"]), True)
                )
            elif kind == "rename":
                done = False
                for i, f_ in enumerate(fields):
                    if f_.name == ch["old"]:
                        fields[i] = T.StructField(ch["new"], f_.dataType, f_.nullable)
                        renames.append(
                            {"at_sv": new_sv, "old": ch["old"], "new": ch["new"]}
                        )
                        done = True
                if not done and not any(f.name == ch["new"] for f in fields):
                    raise ValueError(f"rename source missing: {ch}")
            elif kind == "widen":
                for i, f_ in enumerate(fields):
                    if f_.name == ch["name"]:
                        old_t = _norm_type_name(f_.dataType.simpleString())
                        new_t = _norm_type_name(ch["to_type"])
                        if (old_t, new_t) not in _PROMOTIONS and old_t != new_t:
                            raise ValueError(
                                f"illegal promotion {old_t} -> {new_t}"
                            )
                        fields[i] = T.StructField(
                            f_.name, _parse_type(new_t), f_.nullable
                        )
            else:
                raise ValueError(f"unknown change {ch}")
        new_schema = T.StructType(fields)
        nm = Manifest(
            version=m.version + 1,
            parent=m.version,
            key_col=m.key_col,
            lww_major=m.lww_major,
            n_buckets=m.n_buckets,
            schema_version=new_sv,
            schemas={**m.schemas, str(new_sv): new_schema.jsonValue()},
            renames=renames,
            files=m.files,
            applied_batches=m.applied_batches,
            checkpoint={**m.checkpoint, **(checkpoint_update or {})},
            summary=summary or {"operation": "evolve_schema", "changes": changes},
            committed_at=time.time(),
        )
        self._write_manifest(nm)
        return nm

    # ---------------------------------------------------------------- utils
    def applied_batch_ids(self) -> set[str]:
        return set(self.manifest().applied_batches)

    def checkpoint(self) -> dict[str, Any]:
        return dict(self.manifest().checkpoint)

    def snapshot_staging_dir(self, version: int) -> str:
        return os.path.join(self.data_dir, f"snap-{version:012d}")


def _parse_type(name: str) -> T.DataType:
    mapping = {
        "string": T.StringType(),
        "long": T.LongType(),
        "bigint": T.LongType(),
        "integer": T.IntegerType(),
        "int": T.IntegerType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "boolean": T.BooleanType(),
        "timestamp": T.TimestampType(),
        "binary": T.BinaryType(),
        "date": T.DateType(),
    }
    if name in mapping:
        return mapping[name]
    return T._parse_datatype_string(name)

"""Named snapshot references (Iceberg table refs — the TAG half).

A tag is an immutable name → snapshot-version pointer: ``prod-2026-08-18``,
``before-schema-v3``, ``audit-q3``. Reads resolve the name, time travel
does the rest (``table.read(spark, version=resolve(...))``); snapshot
expiry RETAINS tagged versions regardless of ``keep_last`` (a tag is a
promise that the snapshot stays readable until the tag is dropped).

Branches (mutable heads with independent commit chains) are deliberately
NOT implemented: this lake is single-chain by design — the write-audit-
publish staging area (table.write_staged) already covers the only branch
use case a CDC ingest pipeline has (quality-gate a commit before anyone
reads it), without forking manifest history.

Storage: one JSON file ``_meta/_refs.json`` swapped atomically (write tmp,
fsync, rename) — the same durability discipline as the ``_current``
pointer. Tag metadata is O(tags), never O(table).

Reference parity: the reference's only "named state" is the ConfigDiff a
run hands to the next (MarketoBaseBulkExtractInputPlugin.buildConfigDiff);
tags give the lake-side replacement for "keep the import as of <date>
around for comparison".
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from embulk_input_marketo_spark.lake.table import LakeTable


class RefError(ValueError):
    pass


def _refs_path(table: LakeTable) -> str:
    return os.path.join(table.meta_dir, "_refs.json")


def list_refs(table: LakeTable) -> dict[str, dict[str, Any]]:
    """{name: {"version": int, "created_at": float}} — empty if none."""
    try:
        with open(_refs_path(table)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def _write_refs(table: LakeTable, refs: dict[str, dict[str, Any]]) -> None:
    path = _refs_path(table)
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(refs, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def set_tag(
    table: LakeTable, name: str, version: int | None = None,
    replace: bool = False,
) -> int:
    """Tag a snapshot (default: the current one). Tags are immutable —
    re-pointing an existing name requires ``replace=True`` (the Iceberg
    ``replace tag`` gesture, kept explicit because a silently moved tag
    breaks the "audit-q3 is what we audited" promise)."""
    import time

    if not name or "/" in name or name.startswith("_"):
        raise RefError(f"invalid tag name: {name!r}")
    v = table.current_version() if version is None else int(version)
    # the tagged snapshot must exist (and not be expired)
    table.manifest(v)
    refs = list_refs(table)
    if name in refs and not replace:
        raise RefError(
            f"tag {name!r} exists (-> version {refs[name]['version']}); "
            "pass replace=True to re-point it"
        )
    refs[name] = {"version": v, "created_at": time.time()}
    _write_refs(table, refs)
    return v


def delete_tag(table: LakeTable, name: str) -> None:
    refs = list_refs(table)
    if name not in refs:
        raise RefError(f"no such tag: {name!r}")
    del refs[name]
    _write_refs(table, refs)


def resolve(table: LakeTable, name: str) -> int:
    """Tag name → snapshot version (raises on unknown)."""
    refs = list_refs(table)
    if name not in refs:
        raise RefError(f"no such tag: {name!r}")
    return int(refs[name]["version"])


def read_at(table: LakeTable, spark, name: str, **read_kwargs):
    """Convenience: ``table.read`` at a tag."""
    return table.read(spark, version=resolve(table, name), **read_kwargs)


def tagged_versions(table: LakeTable) -> set[int]:
    """Versions pinned by tags — the expiry retention hook."""
    return {int(r["version"]) for r in list_refs(table).values()}

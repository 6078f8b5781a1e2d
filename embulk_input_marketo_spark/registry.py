"""Avro-style schema registry reconciled into lake schema updates before each
merge — the describe-endpoint flow re-expressed (the reference re-describes
the schema at the start of EVERY run: ``LeadBulkExtractInputPlugin.java:55-63``
→ ``MarketoRestClient.describeLead:179-194``; unknown types default to string,
``model/MarketoField.java:23-29``).

Registry rows (FIXTURES.md A4): (version, field_name, field_type, change,
effective_lsn). ``reconcile`` applies every change whose effective_lsn falls
inside the batch about to merge, as a metadata-only lake commit (no data
rewrite) — add / rename / Iceberg-legal widen.
"""

from __future__ import annotations

from dataclasses import dataclass

from embulk_input_marketo_spark.lake.table import LakeTable

_TYPE_DEFAULT = "string"  # unknown type names default to STRING (MarketoField.java:23-29)
_KNOWN_TYPES = {
    "string", "long", "bigint", "integer", "int", "double", "float",
    "boolean", "timestamp", "binary", "date",
}


@dataclass(frozen=True)
class RegistryEntry:
    version: int
    field_name: str
    field_type: str
    change: str           # 'add' | 'rename:<old>' | 'widen:<old_type>' | 'drop'
    effective_lsn: int

    def normalized_type(self) -> str:
        return self.field_type if self.field_type in _KNOWN_TYPES else _TYPE_DEFAULT


class SchemaRegistry:
    def __init__(self, entries: list[RegistryEntry]):
        self.entries = sorted(entries, key=lambda e: (e.version, e.effective_lsn))
        self._applied_versions: set[tuple[str, int]] = set()

    def pending(self, table: LakeTable, up_to_lsn: int) -> list[RegistryEntry]:
        applied = int(
            table.manifest().checkpoint.get("registry_version", 0) or 0
        )
        return [
            e
            for e in self.entries
            if e.version > applied and e.effective_lsn <= up_to_lsn
        ]

    def reconcile(self, table: LakeTable, up_to_lsn: int) -> bool:
        """Diff registry vs table schema, apply changes effective by
        ``up_to_lsn``. Returns True if the schema changed. Idempotent: the
        applied registry version rides in the manifest checkpoint."""
        todo = self.pending(table, up_to_lsn)
        if not todo:
            return False
        changes = []
        for e in todo:
            if e.change == "add":
                changes.append(
                    {"change": "add", "name": e.field_name, "type": e.normalized_type()}
                )
            elif e.change.startswith("rename:"):
                changes.append(
                    {
                        "change": "rename",
                        "old": e.change.split(":", 1)[1],
                        "new": e.field_name,
                    }
                )
            elif e.change.startswith("widen:"):
                changes.append(
                    {
                        "change": "widen",
                        "name": e.field_name,
                        "to_type": e.normalized_type(),
                    }
                )
            elif e.change == "drop":
                # the reference silently loses removed fields on re-describe
                # (the mapper is rebuilt fresh each run); here the drop is an
                # explicit, logged registry event with the same read semantics
                changes.append({"change": "drop", "name": e.field_name})
            else:
                raise ValueError(f"unknown registry change: {e}")
        max_v = max(e.version for e in todo)
        # applied registry version commits atomically with the schema change
        table.evolve_schema(
            changes,
            summary={"operation": "evolve_schema", "registry_version": max_v},
            checkpoint_update={"registry_version": max_v},
        )
        return True

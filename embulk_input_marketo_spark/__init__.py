"""PySpark-native CDC / incremental-ingest engine.

A from-scratch engine carrying the *semantics* of the reference connector
(treasure-data/embulk-input-marketo — incremental high-water-mark windows,
dynamic schema discovery/reconciliation, typed coercion of stringly data,
dedup keys, resumable idempotent extraction) re-expressed Spark-first:

- changelog (binlog/WAL) tail  → bounded DataFrame scans (replaces paginated
  REST pulls, ``MarketoRestClient.java:397-466`` in the reference)
- last-writer-wins dedup by (warc_ts, lsn) with salting for hot keys
  (``uid_column`` semantics, ``MarketoBaseBulkExtractInputPlugin.java:86-89``)
- MERGE upsert into a snapshot-isolated bucketed Parquet lake table with
  idempotent, manifest-gated exactly-once commits (the reference has none:
  "Resume supported: no", README.md:25)
- schema-registry reconciliation before each merge (the describe-endpoint
  flow, ``MarketoRestClient.java:179-194``)
- checkpointed high-water marks + lineage in the SAME atomic commit as the
  data (the ``ConfigDiff`` analogue,
  ``MarketoBaseBulkExtractInputPlugin.buildConfigDiff:126-137``)
"""

__version__ = "0.1.0"

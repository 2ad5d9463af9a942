"""data_services_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of ``aodn/data-services``
(reference at /root/reference, studied read-only): checkpointed incremental
reads, change detection, last-writer-wins dedup, idempotent upsert, schema
evolution, QC/validation gates with quarantine, lineage + metrics reporting,
and exactly-once sink commits — re-designed Spark-first over a lake table of
multi-turn conversation transcripts keyed by ``(conv_id, turn_idx)``.

Layout:
  lake/       snapshot-committed parquet table format (mini-Iceberg) + checkpoints
  cdc/        change-stream generator, LWW dedup, validation, apply loop, oracle
  operators/  relational + training-data operators (dedup, ANN, text analysis)
  functions/  scalar/column function library
  plans/      reporting views over lineage/metrics (ANMN report shapes)
  sources/    incremental sources (file-list diff, JSONL change tail)
  streaming/  Structured Streaming variant of the apply loop
"""

__version__ = "0.1.0"

"""blq_cli_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `blq-cli` (build-log query)
tool, re-expressed Spark-first.

Layout:
  session.py    — SparkSession factory tuned for local[32] and cluster scale
  schemas.py    — StructTypes for the blq data model (events/runs/attempts/...)
  sources/      — parquet scans, log parsing (rule-table parser), sinks
  plans/        — fluent LogQuery API + filter mini-DSL compiler
  operators/    — the macro/view library (load_events, diff, status, ...)
                  plus large-scale extension ops (dedup, similarity, text)
  functions/    — scalar Column helpers (location strings, refs, badges)
  streaming/    — live-output tail as Structured Streaming
  gates/        — driver-facing gate queries + DuckDB oracle SQL (registry)
"""

__version__ = "0.1.0"

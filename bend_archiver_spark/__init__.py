"""bend_archiver_spark — a PySpark-native analytics/ETL engine.

A from-scratch reimplementation of the *capabilities* of
databendlabs/bend-archiver (a Go single-binary that archives RDBMS
tables into a cloud warehouse via parallel partitioned extraction),
re-expressed Spark-first:

- partition planning (key ranges / time windows)   -> planner.py
- typed job config (JSON-compatible)               -> config.py
- regex db/table catalog discovery                 -> catalog.py
- partitioned JDBC + file sources                  -> sources/
- warehouse sinks (parquet/delta-style, NDJSON)    -> sink.py
- verification / idempotency / delete-after-sync   -> verify.py, postsync.py
- retry + throughput metrics                       -> retry.py, metrics.py
- job orchestration                                -> job.py
- relational + LLM-data-pipeline operators         -> operators/, functions/
- incremental (streaming) archive                  -> streaming/

Everything here is built on the public Apache Spark / PySpark API.
Reference citations in docstrings (file:line) point into the read-only
reference checkout for capability-parity auditing only — no code is
copied from it.
"""

__version__ = "0.1.0"

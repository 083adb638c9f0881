"""Archive maintenance: small-file compaction.

Incremental archives (streaming/archive.py) and per-batch appends
accumulate many small files — the classic long-running-pipeline
problem: at 100 TB, scan throughput is gated by file-open overhead and
tiny row groups defeat both pruning and vectorized reads. Compaction
rewrites a directory into size-targeted files, optionally re-clustered
on the split key so row-group min/max pruning survives the rewrite
(same property job.FileArchiveJob establishes at write time).

The reference has no analog (its unit of write is one staged NDJSON
file per batch, ingester/ingest_databend.go:74-104 — compaction is
Databend's job after COPY INTO); this is engine-side capability the
Spark-native design needs for file/Delta targets.

The rewrite lands in a temporary sibling directory first and swaps in
only after success, so a failed compaction never loses data. On object
stores the swap step maps to a manifest/pointer update (Delta's
OPTIMIZE does exactly this transactionally; this is the plain-parquet
equivalent).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import SparkSession

from .tables import load_parquet

__all__ = ["CompactionResult", "compact_files", "dir_stats"]


@dataclass
class CompactionResult:
    path: str
    files_before: int
    files_after: int
    bytes_before: int
    rows: int


def dir_stats(path: str, suffix: str = ".parquet") -> tuple[int, int]:
    """(file_count, total_bytes) of data files under ``path``."""
    n = 0
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(suffix):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    key: str | None = None,
) -> CompactionResult:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    ``key`` re-clusters on the split key (range partition + in-file
    sort) so key-range scans keep row-group pruning; without it the
    rewrite is a plain bin-pack (round-robin repartition — no skew by
    construction).

    Crash safety: the swap is two directory renames, which POSIX does
    not make atomic as a pair — no row is ever lost, but a crash
    between them leaves the live path absent with the full data
    retained at ``<path>__old`` (recovery: ``mv <path>__old <path>``).
    The retained copy is deleted only after the NEW live path has been
    re-verified to carry every row; a failed re-verification swaps the
    original back and raises. Readers concurrent with the swap can see
    a missing directory for the instant between the renames — schedule
    compaction in a maintenance window (at 100 TB scale, a table
    format with an atomic metadata pointer — e.g. Delta/Iceberg — is
    the proper fix; this operator targets plain parquet directories).
    """
    files_before, bytes_before = dir_stats(path)
    df = load_parquet(spark, path)
    rows = df.count()
    n_out = max(1, -(-bytes_before // target_file_bytes))  # ceil division

    tmp = path.rstrip("/") + "__compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    if key is not None:
        compacted = df.repartitionByRange(n_out, key).sortWithinPartitions(key)
    else:
        compacted = df.repartition(n_out)
    compacted.write.mode("overwrite").parquet(tmp)

    # verify before swap: the rewrite must carry every row
    rewritten = spark.read.parquet(tmp).count()
    if rewritten != rows:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {rows} before, {rewritten} after"
        )
    old = path.rstrip("/") + "__old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    # retain the original until the new live path re-verifies — only
    # then is it safe to drop the recovery copy
    live_rows = spark.read.parquet(path).count()
    if live_rows != rows:
        os.rename(path, tmp)
        os.rename(old, path)
        raise RuntimeError(
            f"compaction live-path mismatch after swap: {rows} expected, "
            f"{live_rows} read back; original restored"
        )
    shutil.rmtree(old, ignore_errors=True)

    files_after, _ = dir_stats(path)
    return CompactionResult(
        path=path,
        files_before=files_before,
        files_after=files_after,
        bytes_before=bytes_before,
        rows=rows,
    )

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


# ---------------------------------------------------------------------------
# Z-order clustering — multi-dimensional data-skipping layout.
#
# Interleaving the low 16 bits of two keys into one Morton value and
# range-partition-sorting on it gives every output file a tight
# min/max envelope on BOTH keys simultaneously, so parquet row-group
# statistics prune scans filtered on either key (a plain sort only
# prunes its leading column). This is the layout step a 100 TB table
# runs at compaction time; the write itself stays fully distributed
# (repartitionByRange + sortWithinPartitions, no global sort).
# ---------------------------------------------------------------------------


def zorder_value(x_col, y_col, bits: int = 16):
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns (x -> even bit positions, y -> odd). Pure JVM
    bit arithmetic; exact and portable."""
    from pyspark.sql import functions as F

    x = x_col.bitwiseAND((1 << bits) - 1)
    y = y_col.bitwiseAND((1 << bits) - 1)
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z + F.shiftleft(F.shiftright(x, b).bitwiseAND(1), 2 * b).cast(
            "long"
        )
        z = z + F.shiftleft(
            F.shiftright(y, b).bitwiseAND(1), 2 * b + 1
        ).cast("long")
    return z


def zorder_write(
    df, path: str, x_name: str, y_name: str, n_files: int, bits: int = 16
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the
    Morton order of (x_name, y_name): range-partition on the z-value
    (parallel sampling, no single-partition sort), sort within each
    partition so row groups inside a file are tight too.

    Both keys are min/max-normalized onto the full ``bits``-bit range
    before interleaving — with raw values, a key whose range uses
    fewer bits contributes only low-order z-bits and the layout
    degenerates to a single-column sort on the wider key. The bounds
    probe is one tiny aggregate (same pattern as the archive jobs'
    bounds probe)."""
    from pyspark.sql import functions as F

    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(x_name), F.max(x_name), F.min(y_name), F.max(y_name)
    ).collect()[0]
    top = (1 << bits) - 1

    def norm(col, lo, hi):
        if hi <= lo:  # constant column: every row maps to 0
            return F.lit(0)
        return F.floor(
            (col - F.lit(lo)).cast("double") * (top / (hi - lo))
        ).cast("long")

    z = zorder_value(
        norm(F.col(x_name), lo_x, hi_x), norm(F.col(y_name), lo_y, hi_y), bits
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )

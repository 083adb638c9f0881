"""Archive verification protocol.

Parity with the reference's correctness contract:
- count verification (A31, IsWorkerCorrect, worker/worker.go:230-242):
  archive is correct iff filtered source count == target count;
- pre-flight idempotency gate (A32, cmd/main.go:74-82): refuse to run
  when the target already holds rows matching the predicate;
- checksum upgrade: order-insensitive content fingerprints (sum of
  per-row xxhash64) — a strictly stronger check than counts that still
  aggregates distributively (one partial agg, no sort, scales to any
  partition count).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["VerifyResult", "count_verify", "idempotency_gate", "content_fingerprint"]


@dataclass
class VerifyResult:
    source_rows: int
    target_rows: int
    # optional checksum upgrade (populated when the job runs with
    # verify_fingerprint): order-insensitive content fingerprints of
    # the filtered source and target — value corruption shows up even
    # when cardinality matches
    source_fingerprint: int | None = None
    target_fingerprint: int | None = None

    @property
    def fingerprints_match(self) -> bool:
        if self.source_fingerprint is None or self.target_fingerprint is None:
            return True  # not requested — counts are the contract
        return self.source_fingerprint == self.target_fingerprint

    @property
    def is_correct(self) -> bool:
        return self.source_rows == self.target_rows and self.fingerprints_match


def count_verify(
    source_df: DataFrame,
    target_df: DataFrame,
    predicate: str | None = None,
) -> VerifyResult:
    """source-vs-target row-count verification (A31)."""
    src = source_df.filter(predicate) if predicate else source_df
    tgt = target_df.filter(predicate) if predicate else target_df
    return VerifyResult(src.count(), tgt.count())


def idempotency_gate(target_df: DataFrame, predicate: str | None = None) -> int:
    """Pre-flight check (A32): returns the number of rows already in
    the target for this predicate. Caller aborts when > 0, exactly as
    cmd/main.go:74-82 does."""
    tgt = target_df.filter(predicate) if predicate else target_df
    return tgt.count()


def content_fingerprint(df: DataFrame) -> int:
    """Order-insensitive content hash: xxhash64 per row (all columns),
    summed distributively. Upgrade over the reference's count-only
    check — detects value corruption, not just cardinality drift."""
    row = (
        df.select(F.xxhash64(*df.columns).cast("decimal(38,0)").alias("h"))
        .agg(F.sum("h").alias("fp"))  # decimal sum: no int64 overflow (ANSI)
        .first()
    )
    return int(row["fp"]) if row["fp"] is not None else 0

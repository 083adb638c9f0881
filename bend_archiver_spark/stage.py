"""Presigned-URL stage upload — the reference's warehouse-stage hop.

Parity with ``ingester/ingest_databend.go:106-180``: the reference
serializes a batch to a local NDJSON file, asks the warehouse for a
presigned URL for a stage location named ``batch/<unix_ts>-<file>``,
HTTP-PUTs the file body to that URL with the presign's headers and a
120 s client timeout, and finally issues ``COPY INTO <table> FROM
<stage>``. Each step failure is wrapped in a sentinel error
(``ErrGetPresignUrl`` / ``ErrUploadStageFailed`` /
``ErrCopyIntoFailed``, ingest_databend.go:26-28) which ``DoRetry``
(ingest_databend.go:206-241) retries up to 500 attempts with 1 s→60 min
exponential backoff.

In the Spark architecture the *default* sink bypasses this hop — each
task writes its partition straight to the target store (``sink.py``),
which is exactly the role the stage played. This module exists for the
deployment where the warehouse only ingests through its own stage API
(a managed Databend with no direct bucket access): the driver, or a
``foreachPartition`` task, pushes serialized NDJSON batches through the
same presign → PUT → COPY INTO contract. The HTTP transport is injected
(any callable with :func:`http_put`'s signature) so the flow is fully
testable against a localhost stub and carries no warehouse SDK
dependency.
"""

from __future__ import annotations

import io
import time
import urllib.error
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass, field

from .retry import RetryableError, do_retry
from .sink import copy_into_sql

__all__ = [
    "StageLocation",
    "PresignedResponse",
    "GetPresignError",
    "UploadStageError",
    "CopyIntoError",
    "PUT_TIMEOUT_SEC",
    "stage_batch_path",
    "http_put",
    "upload_to_stage",
    "ingest_ndjson_batch",
]

# the reference's hard-coded PUT client timeout
# (ingest_databend.go:163-166, "TODO: configurable timeout")
PUT_TIMEOUT_SEC = 120.0


class GetPresignError(RetryableError):
    """Presign request failed (ErrGetPresignUrl, ingest_databend.go:28)."""


class UploadStageError(RetryableError):
    """Stage PUT failed (ErrUploadStageFailed, ingest_databend.go:26)."""


class CopyIntoError(RetryableError):
    """COPY INTO failed (ErrCopyIntoFailed, ingest_databend.go:27)."""


@dataclass(frozen=True)
class StageLocation:
    """A user-stage file reference (godatabend ``StageLocation``):
    rendered as ``@<name>/<path>`` in COPY INTO."""

    name: str
    path: str

    def __str__(self) -> str:
        return f"@{self.name}/{self.path}"


@dataclass(frozen=True)
class PresignedResponse:
    """What the warehouse presign API returns: the PUT target URL and
    the headers the PUT must carry (signature headers, content type)."""

    url: str
    headers: dict[str, str] = field(default_factory=dict)


def stage_batch_path(file_name: str, now_unix: int) -> str:
    """The reference's stage path layout: ``batch/<unix_ts>-<basename>``
    (ingest_databend.go:132-135). The timestamp prefix makes re-uploads
    of a retried batch distinct stage objects, so a half-written
    previous attempt can never be COPY'd."""
    base = file_name.replace("\\", "/").rsplit("/", 1)[-1]
    return f"batch/{now_unix}-{base}"


def http_put(
    url: str,
    body: bytes,
    headers: dict[str, str],
    timeout: float = PUT_TIMEOUT_SEC,
) -> tuple[int, bytes]:
    """Default PUT transport: stdlib urllib with the reference's 120 s
    client timeout (ingest_databend.go:163-166). Returns
    ``(status_code, response_body)``; transport-level failures raise.
    Content-Length is set from the body exactly as the reference sets
    ``req.ContentLength`` from the file size."""
    req = urllib.request.Request(url, data=body, method="PUT")
    for k, v in headers.items():
        req.add_header(k, v)
    req.add_header("Content-Length", str(len(body)))
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        # an HTTP status >= 400 is a *response*, not a transport error —
        # surface it as one so the caller applies the status check
        return e.code, e.read()


def upload_to_stage(
    presign: Callable[[StageLocation], PresignedResponse],
    data: bytes,
    stage_name: str,
    file_name: str,
    now_unix: int | None = None,
    put: Callable[..., tuple[int, bytes]] = http_put,
    timeout: float = PUT_TIMEOUT_SEC,
) -> StageLocation:
    """One stage upload: presign → PUT, returning the stage location
    for the subsequent COPY INTO (parity: ``uploadToStage`` +
    ``UploadToStageByPresignURL``, ingest_databend.go:106-180).

    ``presign`` is the warehouse API call (injected — in production a
    thin wrapper over the warehouse's REST presign endpoint, in tests a
    localhost stub). Failures are wrapped in the two retryable
    sentinels so :func:`bend_archiver_spark.retry.do_retry` applies the
    reference's 500-attempt policy to exactly the failures the
    reference retries."""
    stage = StageLocation(
        name=stage_name,
        path=stage_batch_path(file_name, int(time.time()) if now_unix is None else now_unix),
    )
    try:
        presigned = presign(stage)
    except Exception as e:
        raise GetPresignError(f"failed to get presigned url: {e}") from e
    try:
        status, resp_body = put(
            presigned.url, data, presigned.headers, timeout=timeout
        )
    except Exception as e:
        raise UploadStageError(f"upload stage failed: {e}") from e
    if status >= 400:
        # the reference reads the body and folds it into the error
        # (ingest_databend.go:176-179)
        raise UploadStageError(
            f"upload stage failed, status code: {status}, "
            f"body: {resp_body[:500]!r}"
        )
    return stage


def ingest_ndjson_batch(
    rows_ndjson: bytes,
    presign: Callable[[StageLocation], PresignedResponse],
    execute: Callable[[str], int],
    target_table: str,
    stage_name: str,
    file_name: str,
    now_unix: int | None = None,
    put: Callable[..., tuple[int, bytes]] = http_put,
    purge: bool = True,
    force: bool = False,
    disable_variant_check: bool = True,
    max_attempts: int = 500,
    sleep: Callable[[float], None] = time.sleep,
) -> StageLocation:
    """The reference's full batch-ingest step under its retry policy:
    NDJSON bytes → presigned stage upload → ``COPY INTO``
    (``ingestData``, ingest_databend.go:60-104, wrapped by ``DoRetry``
    at worker call sites). The whole step retries as a unit — a fresh
    attempt re-presigns and re-uploads under a new timestamped stage
    path, so a COPY of a partially-uploaded object can never occur, and
    ``PURGE = true`` (the default, config.py parity) makes the copy
    consume the stage file exactly once."""

    def attempt() -> StageLocation:
        stage = upload_to_stage(
            presign, rows_ndjson, stage_name, file_name,
            now_unix=now_unix, put=put,
        )
        sql = copy_into_sql(
            target_table, str(stage),
            purge=purge, force=force,
            disable_variant_check=disable_variant_check,
        )
        try:
            execute(sql)
        except Exception as e:
            raise CopyIntoError(f"copy into failed: {e}") from e
        return stage

    return do_retry(attempt, max_attempts=max_attempts, sleep=sleep)

"""Presigned-URL stage upload twin (ingester/ingest_databend.go:106-180)
against a real localhost HTTP stub: presign -> PUT -> COPY INTO, with
injected failures driving the reference's 500-attempt retry policy."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from bend_archiver_spark.retry import RetryableError
from bend_archiver_spark.sink import copy_into_sql
from bend_archiver_spark.stage import (
    CopyIntoError,
    GetPresignError,
    PresignedResponse,
    StageLocation,
    UploadStageError,
    ingest_ndjson_batch,
    stage_batch_path,
    upload_to_stage,
)


class _StageStub(BaseHTTPRequestHandler):
    """In-memory object store: PUT bodies keyed by path, with an
    injectable failure budget (the next N PUTs answer 500)."""

    storage: dict[str, bytes] = {}
    headers_seen: dict[str, dict[str, str]] = {}
    fail_next: int = 0

    def do_PUT(self):  # noqa: N802 — http.server API
        cls = type(self)
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        if cls.fail_next > 0:
            cls.fail_next -= 1
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"injected stage failure")
            return
        cls.storage[self.path] = body
        cls.headers_seen[self.path] = dict(self.headers)
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"ok")

    def log_message(self, *args):  # silence per-request stderr lines
        pass


@pytest.fixture(scope="module")
def stub():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _StageStub)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server
    server.shutdown()


@pytest.fixture()
def stub_url(stub):
    _StageStub.storage = {}
    _StageStub.headers_seen = {}
    _StageStub.fail_next = 0
    host, port = stub.server_address
    return f"http://{host}:{port}"


def _presign_for(base_url: str):
    """A presign endpoint mapping stage locations onto the stub, with
    signature-style headers the PUT must echo."""

    def presign(stage: StageLocation) -> PresignedResponse:
        return PresignedResponse(
            url=f"{base_url}/{stage.name}/{stage.path}",
            headers={"X-Signature": f"sig-{stage.path}"},
        )

    return presign


class TestStagePath:
    def test_batch_path_layout(self):
        # golden: batch/<unix_ts>-<basename> (ingest_databend.go:132-135)
        assert stage_batch_path("rows.ndjson", 1755360000) == (
            "batch/1755360000-rows.ndjson"
        )
        # the reference passes a temp-file PATH and takes filepath.Base
        assert stage_batch_path("/tmp/x/rows.ndjson", 7) == "batch/7-rows.ndjson"

    def test_stage_location_renders_at_form(self):
        assert str(StageLocation("mystage", "batch/7-f.ndjson")) == (
            "@mystage/batch/7-f.ndjson"
        )


class TestUploadToStage:
    def test_happy_path_lands_bytes_and_headers(self, stub_url):
        data = b'{"id": 1}\n{"id": 2}\n'
        stage = upload_to_stage(
            _presign_for(stub_url), data, "mystage", "rows.ndjson",
            now_unix=1755360000,
        )
        assert stage == StageLocation("mystage", "batch/1755360000-rows.ndjson")
        key = "/mystage/batch/1755360000-rows.ndjson"
        assert _StageStub.storage[key] == data
        # presign headers carried onto the PUT, content-length exact
        assert _StageStub.headers_seen[key]["X-Signature"] == (
            "sig-batch/1755360000-rows.ndjson"
        )
        assert _StageStub.headers_seen[key]["Content-Length"] == str(len(data))

    def test_put_500_raises_retryable_upload_sentinel(self, stub_url):
        _StageStub.fail_next = 1
        with pytest.raises(UploadStageError, match="status code: 500"):
            upload_to_stage(
                _presign_for(stub_url), b"x", "mystage", "f.ndjson",
                now_unix=1,
            )

    def test_presign_failure_raises_presign_sentinel(self, stub_url):
        def bad_presign(stage):
            raise ConnectionError("warehouse api down")

        with pytest.raises(GetPresignError):
            upload_to_stage(bad_presign, b"x", "mystage", "f.ndjson", now_unix=1)

    def test_transport_failure_is_upload_sentinel(self):
        # unroutable port: the PUT itself fails (reference wraps the
        # client error in ErrUploadStageFailed, ingest_databend.go:145)
        def presign(stage):
            return PresignedResponse(url="http://127.0.0.1:1/x")

        with pytest.raises(UploadStageError):
            upload_to_stage(
                presign, b"x", "mystage", "f.ndjson", now_unix=1, timeout=0.5
            )

    def test_sentinels_are_retryable(self):
        # DoRetry retries exactly the three sink sentinels
        # (ingest_databend.go:229-232); do_retry keys on RetryableError
        for cls in (GetPresignError, UploadStageError, CopyIntoError):
            assert issubclass(cls, RetryableError)


class TestIngestBatch:
    def test_round_trip_with_injected_failures(self, stub_url):
        """NDJSON batch -> stub stage -> COPY INTO, with the first PUT
        and the first COPY failing: the retry policy re-presigns and
        re-uploads, and the final stage object round-trips to the
        original rows."""
        rows = [{"id": 1, "v": "a"}, {"id": 2, "v": None}]
        data = ("\n".join(json.dumps(r) for r in rows) + "\n").encode()
        _StageStub.fail_next = 1

        executed: list[str] = []
        copy_fail = {"n": 1}

        def execute(sql: str) -> int:
            if copy_fail["n"] > 0:
                copy_fail["n"] -= 1
                raise RuntimeError("warehouse hiccup")
            executed.append(sql)
            return len(rows)

        sleeps: list[float] = []
        stage = ingest_ndjson_batch(
            data,
            _presign_for(stub_url),
            execute,
            target_table="db.archive",
            stage_name="mystage",
            file_name="batch.ndjson",
            now_unix=1755360000,
            sleep=sleeps.append,
        )
        # 2 failures -> 2 backoff sleeps (1s then 2s: the reference's
        # exponential policy starting at 1s)
        assert sleeps == [1.0, 2.0]
        # the executed COPY INTO is the golden statement over the stage
        assert executed == [
            copy_into_sql("db.archive", "@mystage/batch/1755360000-batch.ndjson")
        ]
        assert "PURGE = true" in executed[0]
        # stage object content round-trips to the original rows,
        # explicit nulls preserved
        stored = _StageStub.storage[f"/mystage/{stage.path}"]
        assert [json.loads(line) for line in stored.decode().splitlines()] == rows

    def test_gives_up_after_max_attempts(self, stub_url):
        _StageStub.fail_next = 10**9
        with pytest.raises(UploadStageError):
            ingest_ndjson_batch(
                b"x",
                _presign_for(stub_url),
                lambda sql: 0,
                target_table="t",
                stage_name="s",
                file_name="f.ndjson",
                now_unix=1,
                max_attempts=3,
                sleep=lambda s: None,
            )
        _StageStub.fail_next = 0

    def test_copy_failure_is_copy_sentinel(self, stub_url):
        def execute(sql: str) -> int:
            raise RuntimeError("copy rejected")

        with pytest.raises(CopyIntoError):
            ingest_ndjson_batch(
                b"x",
                _presign_for(stub_url),
                execute,
                target_table="t",
                stage_name="s",
                file_name="f.ndjson",
                now_unix=1,
                max_attempts=1,
                sleep=lambda s: None,
            )

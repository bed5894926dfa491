"""HttpEmbeddingClient request shaping: sub-batching (64/request),
dense+sparse endpoint fan-out, retry with backoff, raise-after-
exhaustion — against a real local HTTP server (no network leaves the
box). Mirrors embedding_model/tei_req.py:12,41-77 semantics."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from embedding_to_vectordatabase_spark.operators.embedding import (
    HttpEmbeddingClient,
)


class _Handler(BaseHTTPRequestHandler):
    requests: list[tuple[str, list[str]]] = []
    fail_next: int = 0

    def do_POST(self):  # noqa: N802 (stdlib naming)
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        cls = _Handler
        if cls.fail_next > 0:
            cls.fail_next -= 1
            self.send_response(500)
            self.end_headers()
            return
        cls.requests.append((self.path, body["inputs"]))
        if self.path == "/embed":
            out = [[float(len(t)), 1.0] for t in body["inputs"]]
        else:  # /embed_sparse
            out = [{"7": float(len(t))} for t in body["inputs"]]
        payload = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def server():
    _Handler.requests = []
    _Handler.fail_next = 0
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_sub_batching_order_preserved(server):
    client = HttpEmbeddingClient(server, batch_size=3)
    texts = [f"t{i}" * (i + 1) for i in range(8)]  # distinct lengths
    out = client.embed(texts)
    assert len(out) == 8
    # order-preserving concat across sub-batches (no leading-None quirk;
    # SURVEY §7: the reference's prealloc+extend bug is NOT replicated)
    assert [v[0] for v in out] == [float(len(t)) for t in texts]
    # 8 texts / batch 3 -> 3 requests
    assert len([r for r in _Handler.requests if r[0] == "/embed"]) == 3


def test_hybrid_hits_both_endpoints_and_casts_keys(server):
    client = HttpEmbeddingClient(server, batch_size=4)
    dense, sparse = client.embed_hybrid(["aa", "bbb"])
    assert len(dense) == len(sparse) == 2
    assert sparse[0] == {7: 2.0}  # str key -> int, value -> float
    paths = {r[0] for r in _Handler.requests}
    assert paths == {"/embed", "/embed_sparse"}


def test_retry_then_success(server):
    _Handler.fail_next = 2  # two 500s, third attempt succeeds
    client = HttpEmbeddingClient(server, batch_size=8, max_retries=3)
    client._backoff_base_s = 0.01  # keep the test fast
    out = client.embed(["xy"])
    assert out == [[2.0, 1.0]]


def test_raises_after_exhaustion(server):
    _Handler.fail_next = 99
    client = HttpEmbeddingClient(server, batch_size=8, max_retries=2)
    client._backoff_base_s = 0.01
    with pytest.raises(RuntimeError, match="after 2 retries"):
        client.embed(["xy"])

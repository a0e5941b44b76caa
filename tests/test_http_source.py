"""S9 REST JSON source/sink as a PySpark Python DataSource
(sources/http_source.py): paged parallel reads against a live local HTTP
server, batched POST writes, and task-level partition isolation."""

from __future__ import annotations

import http.server
import json
import threading

import pytest
from pyspark.sql import functions as F

from rclabsapi_spark.sources.http_source import HttpJsonDataSource

PAGE_SIZE = 5
PAGES = 3


@pytest.fixture()
def http_server():
    received_posts: list[bytes] = []
    get_paths: list[str] = []
    lock = threading.Lock()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            with lock:
                get_paths.append(self.path)
            page = int(self.path.split("page=")[1])
            rows = [
                {"id": page * PAGE_SIZE + i, "payload": f"doc-{page}-{i}"}
                for i in range(PAGE_SIZE)
            ]
            body = json.dumps(rows).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            with lock:
                received_posts.append(body)
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *args):
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        yield server.server_address[1], received_posts, get_paths
    finally:
        server.shutdown()


def test_http_read_paged_parallel(spark, http_server):
    port, _, get_paths = http_server
    spark.dataSource.register(HttpJsonDataSource)
    df = (
        spark.read.format("rclabs_http")
        .option("url", f"http://127.0.0.1:{port}/docs")
        .option("pages", PAGES)
        .load()
    )
    # one input partition per page → parallel fetch tasks
    assert df.rdd.getNumPartitions() == PAGES
    rows = {r["id"]: r["payload"] for r in df.collect()}
    assert len(rows) == PAGES * PAGE_SIZE
    assert rows[7] == "doc-1-2"
    assert sorted(get_paths) == [
        f"/docs?page={p}" for p in range(PAGES)
    ]
    # and it feeds normal declarative plans
    n = df.filter(F.col("id") % 2 == 0).count()
    assert n == sum(
        1 for i in range(PAGES * PAGE_SIZE) if i % 2 == 0
    )


def test_http_write_batched_posts(spark, http_server):
    port, received_posts, _ = http_server
    spark.dataSource.register(HttpJsonDataSource)
    df = spark.range(20).select(
        F.col("id"), F.concat(F.lit("p"), F.col("id")).alias("payload")
    ).repartition(2)
    (
        df.write.format("rclabs_http")
        .option("url", f"http://127.0.0.1:{port}/ingest")
        .option("batchsize", 6)
        .mode("append")
        .save()
    )
    docs = [d for body in received_posts for d in json.loads(body)]
    assert {d["id"] for d in docs} == set(range(20))
    assert all(d["payload"] == f"p{d['id']}" for d in docs)
    # batched: no POST exceeds batchsize
    assert all(len(json.loads(b)) <= 6 for b in received_posts)
    # and batching actually batched (not row-at-a-time)
    assert len(received_posts) < 20

"""REST/JSON as a first-class Spark data source (S9 —
request_handler.cpp:417-509's GET/POST surface re-expressed as a PySpark 4
Python DataSource, not a driver-side requests loop).

``spark.read.format("rclabs_http")`` turns a paged JSON endpoint into a
partitioned scan: each page is an ``InputPartition``, so N pages fetch in
parallel across executors and the result is a normal DataFrame feeding
the same declarative plans as any parquet scan. The write path POSTs
JSON batches per partition (one commit message per task), giving the
batched-ship shape of the reference's HTTP sinks with Spark's task
retry/commit protocol around it.

Scale notes: page count is the parallelism knob (1000 pages → 1000
concurrent fetch tasks); payloads deserialize executor-side (the driver
never sees row data); a failed page fetch fails ONE task and Spark
retries that partition, not the whole read. For retry-with-backoff
shipping semantics compose the DataFrame with
``streaming.sources.ship_foreach_batch`` instead — this writer is the
at-least-once task-level primitive.

Register per session: ``spark.dataSource.register(HttpJsonDataSource)``.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

DEFAULT_SCHEMA = "id BIGINT, payload STRING"


class _PagePartition(InputPartition):
    def __init__(self, page: int) -> None:
        self.page = page


class _HttpCommit(WriterCommitMessage):
    def __init__(self, rows: int) -> None:
        self.rows = rows


class HttpJsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.url = options["url"]
        self.pages = int(options.get("pages", 1))
        self.page_param = options.get("pageparam", "page")
        self.timeout = float(options.get("timeout", 10.0))

    def partitions(self) -> Sequence[InputPartition]:
        return [_PagePartition(i) for i in range(self.pages)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        import urllib.request  # executor-side import

        sep = "&" if "?" in self.url else "?"
        url = f"{self.url}{sep}{self.page_param}={partition.page}"
        with urllib.request.urlopen(url, timeout=self.timeout) as resp:
            rows = json.loads(resp.read().decode("utf-8"))
        fields = [f.name for f in self.schema.fields]
        for row in rows:
            yield tuple(row.get(f) for f in fields)


class HttpJsonWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.url = options["url"]
        self.timeout = float(options.get("timeout", 10.0))
        self.batch_size = int(options.get("batchsize", 500))

    def write(self, iterator: Iterator) -> _HttpCommit:
        import urllib.request

        fields = [f.name for f in self.schema.fields]
        total = 0
        batch: list[dict] = []

        def _post(rows: list[dict]) -> None:
            req = urllib.request.Request(
                self.url,
                data=json.dumps(rows).encode("utf-8"),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            urllib.request.urlopen(req, timeout=self.timeout).read()

        for row in iterator:
            batch.append(dict(zip(fields, row)))
            if len(batch) >= self.batch_size:
                _post(batch)
                total += len(batch)
                batch = []
        if batch:
            _post(batch)
            total += len(batch)
        return _HttpCommit(total)

    def commit(self, messages) -> None:  # noqa: ARG002 — protocol hook
        return None

    def abort(self, messages) -> None:  # noqa: ARG002
        return None


class HttpJsonDataSource(DataSource):
    """``format("rclabs_http")`` — options: ``url`` (required), ``pages``
    (read parallelism, default 1), ``pageparam`` (query-param name,
    default ``page``), ``batchsize`` (write batch rows, default 500),
    ``timeout`` (seconds, default 10)."""

    @classmethod
    def name(cls) -> str:
        return "rclabs_http"

    def schema(self) -> str:
        return self.options.get("schema", DEFAULT_SCHEMA)

    def reader(self, schema: StructType) -> HttpJsonReader:
        return HttpJsonReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> HttpJsonWriter:
        return HttpJsonWriter(schema, dict(self.options))

"""A Spark 4 Python DataSource for paginated REST APIs.

Registers ``rest`` as a first-class ``spark.read.format(...)``
source: page ranges become input partitions, so page fetches run in
parallel on executors and the result is an ordinary DataFrame —
the DataSource-V2 form of the reference's driver-side datatable
pagination (S2, `L:77–126`), with the option surface standing in for
the reference's query-param pushdown (S4: whatever predicates the
API accepts ride in the URL template).

Usage::

    spark.dataSource.register(RestDataSource)
    df = (spark.read.format("rest")
          .schema("id long, name string")
          .option("url", "http://api/items?length={length}&start={start}")
          .option("page_size", "1000")
          .option("max_pages", "10")
          .option("envelope_key", "data")
          .load())

The transport is resolved by dotted path (``transport`` option) so
tests can inject fakes; default is the stdlib urllib transport.
Records are matched to the user schema field-by-field (missing keys
→ NULL — the drift-tolerant P2 policy at the source boundary).
"""

from __future__ import annotations

import importlib
import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _resolve_transport(dotted: str | None, timeout: float):
    if not dotted:
        from .rest import urllib_transport

        return urllib_transport(timeout)
    mod, _, fn = dotted.rpartition(".")
    obj = getattr(importlib.import_module(mod), fn)
    # factory (no-arg or timeout-arg) or a ready transport callable
    try:
        return obj(timeout)  # type: ignore[call-arg]
    except TypeError:
        return obj


class _PagePartition(InputPartition):
    def __init__(self, start: int, length: int):
        self.start = start
        self.length = length


class RestReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.url_template = options.get("url")
        if not self.url_template:
            raise ValueError("rest source requires option 'url'")
        self.page_size = int(options.get("page_size", "1000"))
        self.max_pages = int(options.get("max_pages", "1"))
        self.envelope_key = options.get("envelope_key")
        self.transport_path = options.get("transport")
        self.timeout = float(options.get("timeout", "600"))
        self.headers = json.loads(options.get("headers", "{}"))

    def partitions(self):
        # one partition per page → executor-parallel pagination
        return [
            _PagePartition(p * self.page_size, self.page_size)
            for p in range(self.max_pages)
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        transport = _resolve_transport(self.transport_path, self.timeout)
        url = self.url_template.format(
            length=partition.length, start=partition.start
        )
        status, body = transport(url, self.headers)
        if not (200 <= status < 300):
            raise RuntimeError(f"GET {url} failed: status={status}")
        payload = json.loads(body)
        if self.envelope_key is not None:
            payload = payload.get(self.envelope_key, [])
        names = self.schema.fieldNames()
        for rec in payload:
            yield tuple(rec.get(n) for n in names)


class RestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest"

    def reader(self, schema) -> RestReader:
        return RestReader(schema, self.options)

"""Custom connector via the Spark 4 Python Data Source API.

The reference ships its own data sources (the scraper trio,
`link_extractor.py`) — the Spark-native analog of "a source the engine
doesn't ship" is a registered DataSource V2 implementation, not a
driver-side loop. This module implements one with the three contracts
that matter at scale:

  * ``partitions()`` — the parallelism contract: each InputPartition
    becomes one independent task, so a 1000-executor cluster reads
    1000 splits concurrently; no partition enumeration on executors.
  * ``read(partition)`` — a pure generator per split; rows derive
    deterministically from md5 of the row index (the repo's
    cross-engine 60-bit idiom), so a SQL oracle can re-derive the
    exact same rows with ``generate_series`` + ``md5``.
  * ``pushFilters()`` (Spark 4.1) — source-side filtering: equality /
    IN filters on the ``engine`` column are accepted and applied
    inside ``read``, so filtered scans emit only matching rows
    instead of shipping everything to Spark and filtering there.

Reference parity: the generated schema mirrors the link-result rows of
`link_extractor.py:192-198` (engine, se_link) — see FIXTURES.md §1.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)

ENGINES = ("Google", "Bing", "Yahoo")


def link_hash(i: int) -> int:
    """60-bit md5 of 'link:<i>' — mirror:
    CAST('0x' || substr(md5('link:' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)."""
    return int(hashlib.md5(f"link:{i}".encode()).hexdigest()[:15], 16)


@dataclass
class RangePartition(InputPartition):
    start: int
    end: int  # exclusive


class SeededLinksBaseReader(DataSourceReader):
    """Split planning + per-split generation WITHOUT the pushFilters
    method. Spark 4.1 refuses to execute a pushFilters()-implementing
    Python source unless ``spark.sql.python.filterPushdown.enabled``
    is set, so a reader that defines the method couples every
    deferred plan to session-conf state — a consumer that builds the
    plan, lets the conf restore, then materializes would error. The
    base reader therefore carries no pushFilters; the subclass below
    opts in via the ``pushdown`` option for callers that also own the
    conf (the source tests)."""

    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))
        # arrow=true switches read() from row tuples to one Arrow
        # RecordBatch per split — the high-throughput variant of the
        # API (columnar hand-off, no per-row pickling); row-identical
        # to the tuple path by test_arrow_path_row_identical
        self.arrow = str(options.get("arrow", "false")).lower() == "true"
        self.engine_allow: set[str] | None = None  # None → no pushdown

    def partitions(self) -> Sequence[InputPartition]:
        parts = max(1, min(self.parts, self.n)) if self.n else 1
        step = -(-self.n // parts) if self.n else 1
        return [
            RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ] or [RangePartition(0, 0)]

    def _rows(self, partition: RangePartition) -> Iterator[tuple]:
        allow = self.engine_allow
        for i in range(partition.start, partition.end):
            h = link_hash(i)
            engine = ENGINES[h % 3]
            if allow is not None and engine not in allow:
                continue  # source-side filtering (pushed)
            yield (i, engine, f"https://s{h % 97}.example/a{i}", h)

    def read(self, partition: RangePartition) -> Iterator:
        if not self.arrow:
            yield from self._rows(partition)
            return
        import pyarrow as pa

        rows = list(self._rows(partition))
        cols = list(zip(*rows)) if rows else ([], [], [], [])
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(cols[0], type=pa.int64()),
                pa.array(cols[1], type=pa.string()),
                pa.array(cols[2], type=pa.string()),
                pa.array(cols[3], type=pa.int64()),
            ],
            names=["link_id", "engine", "se_link", "h"],
        )


class SeededLinksReader(SeededLinksBaseReader):
    """The pushdown-capable variant (Spark 4.1 pushFilters protocol):
    equality / IN filters on ``engine`` are accepted and applied
    inside ``read``. Requires the session conf
    ``spark.sql.python.filterPushdown.enabled=true`` at EXECUTION
    time (Spark refuses to silently ignore a pushdown
    implementation) — callers opt in with ``.option("pushdown",
    "true")`` and own the conf for the plan's lifetime."""

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("engine",):
                allow = {str(f.value)}
                self.engine_allow = (
                    allow if self.engine_allow is None
                    else self.engine_allow & allow
                )
            elif isinstance(f, In) and f.attribute == ("engine",):
                allow = {str(v) for v in f.value}
                self.engine_allow = (
                    allow if self.engine_allow is None
                    else self.engine_allow & allow
                )
            else:
                yield f  # unsupported → Spark evaluates it post-scan


class SeededLinksDataSource(DataSource):
    """spark.read.format("seeded_links").option("n", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "seeded_links"

    def schema(self) -> str:
        return "link_id bigint, engine string, se_link string, h bigint"

    def reader(self, schema) -> SeededLinksBaseReader:
        if str(self.options.get("pushdown", "false")).lower() == "true":
            return SeededLinksReader(self.options)
        return SeededLinksBaseReader(self.options)

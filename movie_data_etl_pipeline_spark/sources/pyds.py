"""Spark-native Python DataSource connectors (Spark 4 DataSource API).

Upgrades the reference's driver-side paginated REST scan
(``/root/reference/02_etl.py:50-62``, S2 in SURVEY §2.1) into a
first-class partition-parallel Spark source: one ``InputPartition`` per
page, fetched on executors, with page-predicate pruning pushed into
planning via ``pushFilters`` — the 100 TB posture for API ingest (page
ranges sharded across the cluster, no sequential driver loop). The
container has no network, so the transport is a deterministic synthetic
TMDB-shaped generator reproducing the envelope behaviors the reference
must handle: ~``page_size`` movies per page (``02_etl.py:53``), the
last movie of each page re-appearing first on the next page with a
newer payload (the cross-page duplicate that motivates last-wins dedup,
``02_etl.py:224-231``), and empty-string release dates
(``02_etl.py:76``). A ``requests``-backed fetcher drops in behind the
same partition/read contract without changing the plan.

Also provides ``synthetic_events``, a ``SimpleDataSourceStreamReader``
micro-batch source with exactly-replayable offsets (``readBetweenOffsets``
regenerates any committed range deterministically), for driving the
streaming operators without files or Kafka.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_MASK = (1 << 64) - 1

TMDB_PAGES_SCHEMA = (
    "page int, tmdb_movie_id bigint, title string, original_language string, "
    "release_date string, popularity double, vote_average double, "
    "vote_count bigint, genre_ids array<int>"
)

EVENTS_STREAM_SCHEMA = "event_id bigint, user_id bigint, ts_s bigint, event_type string"

_LANGS = ("en", "es", "fr", "de", "ja", "ko", "pt")
_EVENT_TYPES = ("view", "click", "purchase")


def _mix(*xs: int) -> int:
    """Deterministic 64-bit mix (splitmix64-style avalanche) — the
    synthetic stand-in for API payload variety; pure so every executor,
    retry, and replay regenerates identical rows."""
    acc = 0x9E3779B97F4A7C15
    for x in xs:
        acc = (acc ^ ((x & _MASK) * 0xBF58476D1CE4E5B9)) & _MASK
        acc = (((acc >> 31) ^ acc) * 0x94D049BB133111EB) & _MASK
        acc = (acc >> 29) ^ acc
    return acc


def _movie_row(page: int, idx: int, page_size: int) -> tuple:
    """One synthetic movie. The first movie of page p>1 is the SAME id
    as the last movie of page p-1 with a fresher (bumped-popularity)
    payload — the cross-page duplicate the reference's last-wins dedup
    exists for."""
    dup_of_prev = page > 1 and idx == 0
    if dup_of_prev:
        g = (page - 2) * page_size + (page_size - 1)
    else:
        g = (page - 1) * page_size + idx
    mid = 100_000 + g
    h = _mix(mid)
    pop = (h % 10_000) / 10.0 + (5.0 if dup_of_prev else 0.0)
    release = "" if h % 7 == 0 else f"20{h % 25:02d}-{h // 7 % 12 + 1:02d}-{h // 11 % 28 + 1:02d}"
    return (
        page,
        mid,
        f"Movie {mid}",
        _LANGS[h % len(_LANGS)],
        release,
        round(pop, 1),
        round((h // 13 % 101) / 10.0, 1),
        h % 5000,
        sorted({int(h % 19) + 1, int(h // 19 % 19) + 1}),
    )


@dataclass
class PagePartition(InputPartition):
    page: int


class _TmdbPagesReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.pages = int(options.get("pages", 2))
        self.page_size = int(options.get("page_size", 20))
        self._wanted: set[int] | None = None  # None = all pages

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Prune page partitions from EqualTo/In/range predicates on the
        ``page`` column (the filters stay in the plan for any residual
        columns — only fully-handled page filters are absorbed)."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("page",):
                pages = set(range(1, self.pages + 1))
                if isinstance(f, EqualTo):
                    pages &= {int(f.value)}
                elif isinstance(f, In):
                    pages &= {int(v) for v in f.values}
                elif isinstance(f, GreaterThan):
                    pages = {p for p in pages if p > f.value}
                elif isinstance(f, GreaterThanOrEqual):
                    pages = {p for p in pages if p >= f.value}
                elif isinstance(f, LessThan):
                    pages = {p for p in pages if p < f.value}
                elif isinstance(f, LessThanOrEqual):
                    pages = {p for p in pages if p <= f.value}
                else:
                    yield f
                    continue
                self._wanted = pages if self._wanted is None else (self._wanted & pages)
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        pages = range(1, self.pages + 1)
        if self._wanted is not None:
            pages = sorted(self._wanted)
        return [PagePartition(p) for p in pages]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        for idx in range(self.page_size):
            yield _movie_row(partition.page, idx, self.page_size)


class TmdbPagesDataSource(DataSource):
    """``spark.read.format("tmdb_pages").option("pages", N)`` — the
    paginated-API scan as a parallel source (one task per page)."""

    @classmethod
    def name(cls) -> str:
        return "tmdb_pages"

    def schema(self) -> str:
        return TMDB_PAGES_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _TmdbPagesReader(self.options)


def _event_rows(batch: int, batch_size: int) -> list[tuple]:
    rows = []
    for i in range(batch_size):
        eid = batch * batch_size + i
        h = _mix(eid)
        rows.append((eid, h % 50, 1_700_000_000 + eid * 7, _EVENT_TYPES[h % 3]))
    return rows


class _EventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.batch_size = int(options.get("batch_size", 100))
        self.max_batches = int(options.get("max_batches", 3))

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        b = int(start["batch"])
        if b >= self.max_batches:
            return iter([]), start
        return iter(_event_rows(b, self.batch_size)), {"batch": b + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # exact replay of any committed range — the recovery contract
        rows: list[tuple] = []
        for b in range(int(start["batch"]), int(end["batch"])):
            rows.extend(_event_rows(b, self.batch_size))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    """``spark.readStream.format("synthetic_events")`` — bounded
    deterministic micro-batch event source (``max_batches`` batches of
    ``batch_size``), replayable byte-for-byte from any offset range."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return EVENTS_STREAM_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _EventsStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotently register both connectors on a session.

    Also flips ``spark.sql.python.filterPushdown.enabled`` on at runtime:
    ``_TmdbPagesReader`` implements ``pushFilters()``, and Spark 4 refuses
    to even initialize such a reader (DATA_SOURCE_PUSHDOWN_DISABLED) when
    the conf is false. The repo's own session factory sets it at build
    time, but a *vanilla* SparkSession (e.g. the correctness driver's)
    does not — setting it here makes every consumer of these sources
    session-independent. The conf is runtime-settable (RuntimeConfig, not
    a static conf), so this is safe on a live session.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TmdbPagesDataSource)
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlDirDataSource)


# ---------------------------------------------------------------------------
# Write path: JSONL directory sink with a staged two-phase commit
# ---------------------------------------------------------------------------


@dataclass
class _StagedFile(WriterCommitMessage):
    staged: str
    rows: int


class _JsonlDirWriter(DataSourceWriter):
    """Task-parallel JSONL writer with the classic staging commit
    protocol: every task writes to ``<path>/_staging/<task-attempt>``,
    the DRIVER promotes staged files to ``part-NNNNN.jsonl`` and drops a
    ``_SUCCESS`` manifest only after every task reported success; abort
    removes the staging area. Readers that require ``_SUCCESS`` (or list
    only ``part-*``) therefore never observe a partial write — the
    atomicity contract a production committer provides on object
    storage, demonstrated on the local filesystem (executors and driver
    share it in local mode; on a cluster the same protocol targets
    shared/cloud storage)."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options["path"]
        self.overwrite = overwrite
        self.fail_partition = int(options.get("fail_partition", -1))

    def write(self, iterator):  # executor-side
        import json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        if pid == self.fail_partition:
            raise RuntimeError(f"injected failure in partition {pid}")
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        fname = os.path.join(staging, f"task-{pid}-{attempt}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _StagedFile(staged=fname, rows=n)

    def commit(self, messages):  # driver-side, all tasks succeeded
        import json
        import os

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("part-") and f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        finals = []
        total = 0
        for i, m in enumerate(sorted(messages, key=lambda m: m.staged)):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.staged, final)
            finals.append(os.path.basename(final))
            total += m.rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"files": finals, "total_rows": total}, f)
        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging) and not os.listdir(staging):
            os.rmdir(staging)

    def abort(self, messages):  # driver-side, something failed
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class JsonlDirDataSource(DataSource):
    """``df.write.format("jsonl_dir").option("path", dir).save()`` —
    the write-path counterpart of the read connectors above, completing
    the custom-connector surface (the reference only ever INSERTs into
    Postgres, ``02_etl.py:84-101``; this is the lake-sink analogue with
    an explicit two-phase commit)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _JsonlDirWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> "DataSourceStreamWriter":
        return _JsonlDirStreamWriter(self.options)


class _JsonlDirStreamWriter(DataSourceStreamWriter):
    """Streaming counterpart of the batch sink: per micro-batch the same
    stage→promote protocol, with files and manifest namespaced by EPOCH
    (``part-<batch>-NNNNN.jsonl`` + ``_EPOCH-<batch>``). Re-committing
    an epoch after crash/replay first clears that epoch's artifacts —
    re-delivery converges to one copy per epoch (idempotent commit), the
    exactly-once contract Structured Streaming expects its sinks to
    provide on top of its replayed offsets."""

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator):  # executor-side, per micro-batch task
        import json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fname = os.path.join(staging, f"task-{pid}-{attempt}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _StagedFile(staged=fname, rows=n)

    def commit(self, messages, batchId: int) -> None:  # driver-side
        import json
        import os

        # idempotent re-commit: wipe any artifacts this epoch left before
        for f in os.listdir(self.path):
            if f.startswith(f"part-{batchId:010d}-") or f == f"_EPOCH-{batchId:010d}":
                os.remove(os.path.join(self.path, f))
        finals = []
        total = 0
        for i, m in enumerate(sorted((m for m in messages if m), key=lambda m: m.staged)):
            final = os.path.join(self.path, f"part-{batchId:010d}-{i:05d}.jsonl")
            os.replace(m.staged, final)
            finals.append(os.path.basename(final))
            total += m.rows
        with open(os.path.join(self.path, f"_EPOCH-{batchId:010d}"), "w") as f:
            json.dump({"batch": batchId, "files": finals, "total_rows": total}, f)

    def abort(self, messages, batchId: int) -> None:
        import shutil
        import os

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

"""LogStore: the Spark-native storage layer for the blq data model.

Layout (mirrors the reference's partitioned-parquet generation,
src/blq/schema.sql:4-13 and BIRD blob layout, bird_schema.sql:6-14):

    <root>/runs/date=YYYY-MM-DD/*.parquet
    <root>/events/date=YYYY-MM-DD/*.parquet
    <root>/attempts/..., <root>/outcomes/..., <root>/outputs/...
    <root>/blobs/content/<2-char-shard>/<hash>.bin

Design decisions vs the reference:
- DuckDB single-writer file + lock-retry (bird.py:36-99) -> append-only
  parquet guarded by a short store-write lock. Parquet part FILES never
  conflict (unique names), but Spark's FileOutputCommitter stages every
  append job under the table's shared `_temporary/0` directory, and a
  concurrent job's commit/cleanup deletes the other job's staged files
  — measured: 8 unsynchronized threads lost 9/32 appends. `_append`
  therefore serializes on an O_EXCL file lock (cross-process) plus a
  per-root threading lock (in-process fast path). The lock covers only
  the tiny metadata write (a few rows per run), never a corpus-sized
  job, so ingest throughput is bounded by job latency, not data volume
  — the same single-writer contract as the reference, scoped to the
  commit instead of the whole store.
- global run_serial via single-partition window (bird_schema.sql:288-295)
  -> assigned HERE at ingest from a durable counter file advanced under
  the same store-write lock (next_serial) — unique across concurrent
  writer threads and processes, monotone across prunes.
- content-addressing: BLAKE2b in the reference (bird.py:1323) -> sha256;
  the hash is an opaque key, parity not required (SURVEY.md F20).
  Inline threshold 4096 bytes -> data: URI, else sharded blob file
  (reference bird.py:106-107, 1304-1360).
"""

from __future__ import annotations

import contextlib
import datetime as _dt
import hashlib
import json
import os
import threading
import uuid
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from blq_cli_spark import schemas
from blq_cli_spark.operators import views

INLINE_THRESHOLD = 4096  # bytes (reference bird.py:106-107)

# in-process append serialization, one lock per store root (threads in
# the same SparkSession share a PID, so the file lock alone can't order
# them — the holder looks alive to every sibling thread)
_APPEND_LOCKS: dict[str, threading.Lock] = {}
_APPEND_LOCKS_GUARD = threading.Lock()
_WRITE_LOCK_NAME = "store-write"
_WRITE_LOCK_WAIT_S = 120.0

_TABLES = {
    "runs": schemas.RUNS_SCHEMA,
    "events": schemas.EVENTS_SCHEMA,
    "attempts": schemas.ATTEMPTS_SCHEMA,
    "outcomes": schemas.OUTCOMES_SCHEMA,
    "outputs": schemas.OUTPUTS_SCHEMA,
    "sessions": schemas.SESSIONS_SCHEMA,
    "annotations": schemas.ANNOTATIONS_SCHEMA,
}


@dataclass
class LogStore:
    spark: SparkSession
    root: str

    # -- table access --------------------------------------------------------

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def table(self, name: str) -> DataFrame:
        schema = _TABLES[name]
        path = self._path(name)
        if not os.path.isdir(path) or not any(
            f for f in os.listdir(path) if not f.startswith(".")
        ):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)

    def runs(self) -> DataFrame:
        return self.table("runs")

    def events(self) -> DataFrame:
        return self.table("events")

    def attempts(self) -> DataFrame:
        return self.table("attempts")

    def outcomes(self) -> DataFrame:
        return self.table("outcomes")

    def outputs(self) -> DataFrame:
        return self.table("outputs")

    # -- derived views (the macro library) ------------------------------------

    def events_flat(self) -> DataFrame:
        return views.load_events(self.events(), self.runs())

    def runs_loaded(self) -> DataFrame:
        return views.load_runs(self.runs(), self.events())

    def attempts_loaded(self) -> DataFrame:
        return views.load_attempts(self.attempts(), self.outcomes())

    def source_status(self) -> DataFrame:
        return views.load_source_status(self.runs_loaded(), self.attempts_loaded())

    def register_views(self) -> None:
        """Expose the spark.sql surface (reference raw-SQL path,
        storage.py:560-582)."""
        for name in _TABLES:
            self.table(name).createOrReplaceTempView(name)
        self.events_flat().createOrReplaceTempView("events_flat")
        self.runs_loaded().createOrReplaceTempView("runs_loaded")

    # -- ergonomic Python API (reference docs/python-api.md:37-70) ------------

    @classmethod
    def open(cls, path: str | None = None, spark: SparkSession | None = None) -> "LogStore":
        """Open a store: explicit path, $BLQ_SPARK_STORE, or walk up from
        cwd looking for `.bird-spark` (reference LogStore.open +
        _find_lq_dir, query.py:593-677). Builds the tuned session when
        none is passed."""
        if spark is None:
            from blq_cli_spark.session import get_spark

            spark = get_spark()
        if path is None:
            path = os.environ.get("BLQ_SPARK_STORE")
        if path is None:
            d = os.getcwd()
            while True:
                cand = os.path.join(d, ".bird-spark")
                if os.path.isdir(cand):
                    path = cand
                    break
                parent = os.path.dirname(d)
                if parent == d:
                    path = os.path.join(os.getcwd(), ".bird-spark")
                    break
                d = parent
        return cls(spark, path)

    def query(self):
        """Fluent entry: LogQuery over events_flat (reference
        store.events() -> LogQuery; the raw table accessor keeps the
        `events()` name here, so the builder gets `query()`)."""
        from blq_cli_spark.plans.query import LogQuery

        return LogQuery(self.events_flat())

    def run_events(self, run_serial: int):
        """Events of one run as a LogQuery (reference store.run(n))."""
        return self.query().filter(F.col("run_serial") == run_serial)

    def latest_run(self) -> int | None:
        """Most recent run_serial (reference store.latest_run())."""
        row = self.runs().agg(F.max("run_serial").alias("m")).collect()[0]
        return int(row["m"]) if row["m"] is not None else None

    def event(self, run_serial: int, event_index: int) -> dict | None:
        """One event as a dict (reference store.event(run, idx))."""
        rows = (
            self.events_flat()
            .filter(
                (F.col("run_serial") == run_serial)
                & (F.col("event_index") == event_index)
            )
            .limit(1)
            .collect()
        )
        return rows[0].asDict() if rows else None

    def has_data(self) -> bool:
        """Any runs stored? LIMIT-1 probe (reference store.has_data())."""
        return bool(self.runs().limit(1).collect())

    def sql(self, query: str) -> DataFrame:
        """Raw SQL over the registered views WITH blq_* macro expansion
        (reference store.sql / connection.sql over DuckDB macros)."""
        from blq_cli_spark.plans.sql_macros import expand_macros

        self.register_views()
        return self.spark.sql(expand_macros(query, self))

    # -- ingest ---------------------------------------------------------------

    def next_serial(self) -> int:
        """Next run_serial — UNIQUE across concurrent writer threads and
        processes (round 5; previously a process-local cached max).

        The issued high-water mark lives in a durable counter file
        (`<root>/run_serial`) advanced under the store-write lock —
        the same single-writer discipline as the reference's DuckDB
        lock (bird.py:36-99), scoped to a microsecond file bump instead
        of the whole store. First use on a pre-counter store seeds the
        file from max(run_serial) over the runs table (one tiny
        dimension scan, once); every later call is pure file I/O — no
        Spark job. Crash between bump and append skips a serial, which
        is harmless (serials are ordinal, not dense)."""
        with self._write_lock():
            return self._reserve_serials_locked(1)

    def reserve_serials(self, count: int) -> int:
        """Reserve `count` consecutive serials; returns the base B such
        that B+1..B+count are this caller's (bulk ingest/migration)."""
        with self._write_lock():
            first = self._reserve_serials_locked(count)
            return first - 1

    def _reserve_serials_locked(self, count: int) -> int:
        """Advance the counter file by `count`, returning the first
        reserved serial. Caller must hold the store-write lock. First
        use on a pre-counter store seeds from max(run_serial)."""

        def _seed() -> int:
            row = self.runs().agg(F.max("run_serial").alias("m")).collect()[0]
            return int(row["m"] or 0)

        return _advance_serial_file(self.root, count, _seed)

    def schema_version(self) -> str | None:
        """Stored schema version of this store, None if unmarked
        (pre-versioning store or empty dir)."""
        try:
            with open(os.path.join(self.root, "schema_version")) as fh:
                return fh.read().strip() or None
        except OSError:
            return None

    def _check_writable_schema(self) -> None:
        """Write-compat gate (reference docs/schema-stability.md semver
        contract): writers refuse a store from a DIFFERENT MAJOR —
        breaking layouts need `blq-spark migrate`, not silent mixing.
        Reads stay allowed (additive minors are backward-readable).
        Unmarked stores are stamped on first write."""
        marker = os.path.join(self.root, "schema_version")
        found = self.schema_version()
        if found is None:
            os.makedirs(self.root, exist_ok=True)
            with open(marker, "w") as fh:
                fh.write(schemas.SCHEMA_VERSION)
            return
        if found.split(".")[0] != schemas.SCHEMA_VERSION.split(".")[0]:
            raise RuntimeError(
                f"store at {self.root} has schema {found}, this engine "
                f"writes {schemas.SCHEMA_VERSION}; run `blq-spark migrate`"
            )

    @contextlib.contextmanager
    def _write_lock(self):
        """Serialize table-append JOBS against this store (see module
        docstring: Spark append jobs share `_temporary` staging, so
        concurrent commits corrupt each other). In-process threading
        lock first, then the cross-process O_EXCL file lock with
        dead-holder reclaim."""
        from blq_cli_spark.sources import locks as locks_mod

        root = os.path.abspath(self.root)
        with _APPEND_LOCKS_GUARD:
            tlock = _APPEND_LOCKS.setdefault(root, threading.Lock())
        with tlock:
            locks_dir = os.path.join(self.root, "locks")
            held = locks_mod.acquire_lock_wait(
                locks_dir, _WRITE_LOCK_NAME, str(uuid.uuid4()), "<store-append>",
                timeout=_WRITE_LOCK_WAIT_S,
            )
            try:
                yield
            finally:
                locks_mod.release_lock(locks_dir, _WRITE_LOCK_NAME, held)

    def _append(self, name: str, rows: list[dict]) -> None:
        if not rows:
            return
        self._check_writable_schema()
        df = self.spark.createDataFrame(
            [self._conform(r, _TABLES[name]) for r in rows], _TABLES[name]
        )
        with self._write_lock():
            df.write.mode("append").partitionBy("date").parquet(self._path(name))

    @staticmethod
    def _conform(row: dict, schema) -> dict:
        return {f.name: row.get(f.name) for f in schema.fields}

    def append_run(
        self,
        run: dict,
        events: list[dict] | None = None,
        output: str | bytes | None = None,
        stream: str = "combined",
    ) -> dict:
        """Ingest one completed run + its parsed events + raw output.

        Fills ids/serials/dates; returns the stored run row (reference
        write path: storage.py:397-495, bird.py:775-823, 1304-1360,
        1563-1629)."""
        run = dict(run)
        run.setdefault("id", str(uuid.uuid4()))
        ts = run.setdefault("timestamp", _dt.datetime.now())
        run.setdefault("date", ts.date())
        run["run_serial"] = run.get("run_serial") or self.next_serial()
        self._append("runs", [run])

        ev_rows = []
        for i, ev in enumerate(events or [], start=1):
            ev = dict(ev)
            ev.setdefault("id", str(uuid.uuid4()))
            ev["invocation_id"] = run["id"]
            ev.setdefault("event_index", i)
            ev.setdefault("date", run["date"])
            ev_rows.append(ev)
        self._append("events", ev_rows)

        if output is not None:
            self.write_output(run["id"], output, stream=stream, date=run["date"])
        return run

    # -- content-addressed output storage -------------------------------------

    def write_output(
        self, invocation_id: str, content: str | bytes, stream: str = "combined", date=None
    ) -> dict:
        data = content.encode() if isinstance(content, str) else content
        digest = hashlib.sha256(data).hexdigest()
        if len(data) <= INLINE_THRESHOLD:
            storage_type, storage_ref = "inline", "data:text/plain;base64," + _b64(data)
        else:
            storage_type, storage_ref = "blob", self._write_blob(digest, data)
        row = {
            "id": str(uuid.uuid4()),
            "invocation_id": invocation_id,
            "stream": stream,
            "content_hash": digest,
            "byte_length": len(data),
            "storage_type": storage_type,
            "storage_ref": storage_ref,
            "content_type": "text/plain",
            "date": date or _dt.date.today(),
        }
        self._append("outputs", [row])
        return row

    def _write_blob(self, digest: str, data: bytes) -> str:
        """Sharded, write-once, content-addressed blob (reference
        bird.py:1460-1513). Existing file -> dedup hit, no rewrite."""
        shard_dir = os.path.join(self.root, "blobs", "content", digest[:2])
        os.makedirs(shard_dir, exist_ok=True)
        path = os.path.join(shard_dir, f"{digest}.bin")
        if not os.path.exists(path):
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, path)
        return path

    def read_output(self, storage_ref: str) -> bytes:
        if storage_ref.startswith("data:"):
            import base64

            return base64.b64decode(storage_ref.split(",", 1)[1])
        with open(storage_ref, "rb") as fh:
            return fh.read()

    def cleanup_orphaned_blobs(self) -> int:
        """Blob GC: delete blob files not referenced by any outputs row
        (reference bird.py:1515-1561).

        The anti-join runs IN Spark — blob-dir hashes (a listing the
        driver needs anyway to delete files) against the outputs table —
        so the driver never materializes the live-hash set; it collects
        only the orphans, which a healthy store keeps near-empty."""
        content_root = os.path.join(self.root, "blobs", "content")
        if not os.path.isdir(content_root):
            return 0
        on_disk = [
            (fname[:-4], os.path.join(content_root, shard, fname))
            for shard in os.listdir(content_root)
            for fname in os.listdir(os.path.join(content_root, shard))
            if fname.endswith(".bin")
        ]
        if not on_disk:
            return 0
        disk_df = self.spark.createDataFrame(on_disk, "content_hash string, path string")
        orphans = disk_df.join(
            self.outputs().select("content_hash").distinct(),
            "content_hash",
            "left_anti",
        )
        removed = 0
        for row in orphans.select("path").collect():
            os.remove(row["path"])
            removed += 1
        return removed

    # -- attempts lifecycle (ST2) ---------------------------------------------

    def start_attempt(self, attempt: dict) -> dict:
        attempt = dict(attempt)
        attempt.setdefault("id", str(uuid.uuid4()))
        ts = attempt.setdefault("started_at", _dt.datetime.now())
        attempt.setdefault("date", ts.date())
        self._append("attempts", [attempt])
        return attempt

    def complete_attempt(self, attempt_id: str, outcome: dict) -> dict:
        outcome = dict(outcome)
        outcome["attempt_id"] = attempt_id
        ts = outcome.setdefault("completed_at", _dt.datetime.now())
        outcome.setdefault("date", ts.date())
        self._append("outcomes", [outcome])
        return outcome

    def maintain_rollup(self, today=None) -> int:
        """Incremental continuous-aggregate maintenance (operators/
        rollup.py): roll up closed event dates not yet rolled. Run as
        periodic maintenance beside compact()/sweep_orphans()."""
        from blq_cli_spark.operators import rollup

        return rollup.maintain(self, today=today)

    def severity_timeseries(self, today=None) -> DataFrame:
        """Rollup-first severity/tool counts per day (correct at every
        instant; raw scan limited to unrolled dates)."""
        from blq_cli_spark.operators import rollup

        return rollup.timeseries(self, today=today)

    def sweep_orphans(self, max_age_seconds: float = 60.0, now=None) -> int:
        """Orphan sweep: pending attempts older than the threshold get a
        NULL-exit outcome (reference bird.py:1178-1271 — wall-clock age,
        no PID check in the Spark port)."""
        now = now or _dt.datetime.now()
        pending = views.running(self.attempts(), self.outcomes()).collect()
        n = 0
        for row in pending:
            age = (now - row["started_at"]).total_seconds()
            if age > max_age_seconds:
                self.complete_attempt(
                    row["id"],
                    {"completed_at": now, "exit_code": None, "timeout": False},
                )
                n += 1
        return n


    # -- retention / pruning (reference storage.py:624-714) --------------------

    def prune_runs(
        self,
        max_age_days: int | None = None,
        max_runs_per_source: int | None = None,
        now: _dt.datetime | None = None,
    ) -> int:
        """Retention: drop runs (and their events/outputs) older than
        max_age_days and/or beyond the newest max_runs_per_source per
        source (reference W3 retention ranking, storage.py:647-676).

        The age rule is a pure partition drop: every table is
        hive-partitioned by date, so expired data is whole `date=`
        directories — removed without reading a row. The per-source
        ranking rule rewrites via a broadcast semi-join against the keep
        set (run ids — dimension-scale); the fact tables (events,
        outputs) are filtered and rewritten entirely on executors
        (`_rewrite`), never driver-materialized."""
        from pyspark.sql import Window

        total = self.runs().count()
        if max_age_days is not None:
            now = now or _dt.datetime.now()
            cutoff = (now - _dt.timedelta(days=max_age_days)).date()
            for name in ("runs", "events", "outputs"):
                self._drop_date_partitions(name, cutoff)
        if max_runs_per_source is not None:
            w = Window.partitionBy(
                F.coalesce("source_name", F.lit("__none__"))
            ).orderBy(F.desc("timestamp"))
            # persist the keep set: its lazy plan reads the runs dir,
            # which the first _rewrite_keep swaps out from under it
            keep_ids = (
                self.runs()
                .withColumn("_rank", F.row_number().over(w))
                .filter(F.col("_rank") <= max_runs_per_source)
                .select("id")
                .persist()
            )
            try:
                if keep_ids.count() < self.runs().count():
                    self._rewrite_keep("runs", "id", keep_ids)
                    self._rewrite_keep("events", "invocation_id", keep_ids)
                    self._rewrite_keep("outputs", "invocation_id", keep_ids)
            finally:
                keep_ids.unpersist()
        # serials are never reused after a prune: the durable counter
        # (next_serial) keeps the high-water mark monotone
        return total - self.runs().count()

    def prune_by_size(self, max_total_bytes: int) -> int:
        """Size-based retention: drop oldest runs until total stored output
        bytes fit (reference J10 size accounting + oldest-first prune,
        storage.py:697-705): left join outputs->runs, cumulative window
        newest-first, delete the suffix."""
        from pyspark.sql import Window

        sizes = (
            self.runs()
            .join(
                self.outputs().groupBy("invocation_id").agg(
                    F.sum("byte_length").alias("bytes")
                ),
                F.col("id") == F.col("invocation_id"),
                "left",
            )
            .select("id", "timestamp", F.coalesce("bytes", F.lit(0)).alias("bytes"))
        )
        w = Window.orderBy(F.desc("timestamp")).rowsBetween(Window.unboundedPreceding, 0)
        ranked = sizes.withColumn("cum_bytes", F.sum("bytes").over(w))
        # the window runs over the runs dimension (one row per run), not
        # the fact tables; the single-partition frame is fine there
        n_drop = ranked.filter(F.col("cum_bytes") > max_total_bytes).count()
        if n_drop:
            keep_ids = (
                ranked.filter(F.col("cum_bytes") <= max_total_bytes)
                .select("id")
                .persist()  # plan reads runs/outputs dirs that the swaps replace
            )
            try:
                keep_ids.count()
                self._rewrite_keep("runs", "id", keep_ids)
                self._rewrite_keep("events", "invocation_id", keep_ids)
                self._rewrite_keep("outputs", "invocation_id", keep_ids)
            finally:
                keep_ids.unpersist()
        return n_drop

    def _drop_date_partitions(self, name: str, cutoff: _dt.date) -> int:
        """Age-based retention as a metadata-only partition drop: remove
        whole `date=` directories older than the cutoff. ISO dates sort
        lexicographically, so no parsing needed. Zero rows read — the
        100 TB-safe path for expiring old data."""
        import shutil

        path = self._path(name)
        if not os.path.isdir(path):
            return 0
        dropped = 0
        for part in os.listdir(path):
            if part.startswith("date=") and part[5:] < cutoff.isoformat():
                shutil.rmtree(os.path.join(path, part), ignore_errors=True)
                dropped += 1
        return dropped

    def _rewrite_keep(self, name: str, key: str, keep_ids: DataFrame) -> None:
        """Rewrite a table keeping only rows whose `key` appears in
        keep_ids, via a broadcast left-semi join executed on executors.

        The filtered DataFrame is written to a staging directory first
        and directories are swapped only after the write succeeds
        (compact()'s pattern) — a crash mid-prune leaves either the old
        table or the new one intact, never neither, and the driver never
        materializes fact-table rows (reference storage.py:647-676)."""
        import shutil

        path = self._path(name)
        if not os.path.isdir(path):
            return
        df = self.table(name).join(
            F.broadcast(keep_ids.withColumnRenamed("id", key)), key, "left_semi"
        )
        tmp = path + ".rewrite.tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").partitionBy("date").parquet(tmp)
        old = path + ".rewrite.old"
        shutil.rmtree(old, ignore_errors=True)
        os.replace(path, old)
        os.replace(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    def compact(self, name: str = "events", target_rows_per_file: int = 1_000_000) -> int:
        """Small-file compaction: append-per-run leaves one parquet file
        per run per partition — correct (lock-free concurrent writers)
        but at 100 TB it is millions of tiny files and scan throughput
        dies on open/footer overhead. Compaction rewrites each date
        partition's files into ceil(rows / target) right-sized files.

        Returns the number of files removed. Run as periodic maintenance
        (like the reference's auto-prune, execution.py:1352-1461); on a
        real deployment this is the OPTIMIZE job and old dates (closed
        partitions) only ever need it once."""
        import math
        import shutil

        path = self._path(name)
        if not os.path.isdir(path):
            return 0
        removed = 0
        for part in sorted(os.listdir(path)):
            pdir = os.path.join(path, part)
            if not (part.startswith("date=") and os.path.isdir(pdir)):
                continue
            files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            if len(files) <= 1:
                continue
            # read the partition dir directly (files store all columns
            # except the hive partition col `date`, which lives in the
            # dir name and must stay out of the rewritten files)
            df = self.spark.read.parquet(pdir)
            rows = df.count()
            n_out = max(1, math.ceil(rows / target_rows_per_file))
            tmp = pdir + ".compact.tmp"
            # sort within files on the hot filter columns while rewriting:
            # parquet min/max row-group stats then skip row groups for
            # severity/tool filters — free data-skipping clustered at the
            # one moment the partition is rewritten anyway
            sort_cols = [
                c for c in ("severity", "tool_name", "source_name") if c in df.columns
            ]
            out = df.coalesce(n_out)
            if sort_cols:
                out = out.sortWithinPartitions(*sort_cols)
            out.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(pdir)
            os.replace(tmp, pdir)
            removed += len(files) - n_out
        return removed

    # -- sync/export + global multi-root scan (S2/S13) -------------------------

    def sync_to(
        self, dest_root: str, hostname: str, namespace: str, project: str
    ) -> str:
        """Export this store's events under the global
        hostname=/namespace=/project= tree (reference sync_cmd.py:37-167).
        Written as real partition directories so a multi-root reader gets
        partition pruning on all three levels."""
        dest = os.path.join(
            dest_root,
            f"hostname={hostname}",
            f"namespace={namespace}",
            f"project={project}",
        )
        # the events hostname column would clash with the hostname= partition
        flat = self.events_flat().drop("hostname")
        flat.write.mode("overwrite").partitionBy("date").parquet(dest)
        return dest

    @staticmethod
    def read_global(spark: SparkSession, dest_root: str) -> DataFrame:
        """Multi-root hive scan: hostname/namespace/project become columns
        (reference from_parquet_root, query.py:616-667)."""
        return (
            spark.read.option("basePath", dest_root)
            .option("mergeSchema", "true")
            .parquet(f"{dest_root}/hostname=*/namespace=*/project=*")
        )


def _b64(data: bytes) -> str:
    import base64

    return base64.b64encode(data).decode()


# -- command registry + suppression lists (driver-side config) ----------------
# Reference: registered commands resolved by `blq run <name>`
# (core.py:1080-1214) and per-command suppression lists (core.py:1459-1500).
# Tiny mutable config -> a JSON file beside the tables, not a Spark table.


def _config_path(store: "LogStore") -> str:
    return os.path.join(store.root, "config.json")


def _load_config(store: "LogStore") -> dict:
    try:
        with open(_config_path(store)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {"commands": {}, "suppressions": {}}


def _save_config(store: "LogStore", cfg: dict) -> None:
    os.makedirs(store.root, exist_ok=True)
    tmp = _config_path(store) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(cfg, fh, indent=2, sort_keys=True)
    os.replace(tmp, _config_path(store))


def register_command(
    store: "LogStore",
    name: str,
    argv: list[str],
    fmt: str | None = None,
    tag: str | None = None,
) -> None:
    cfg = _load_config(store)
    cfg.setdefault("commands", {})[name] = {"argv": argv, "fmt": fmt, "tag": tag}
    _save_config(store, cfg)


def unregister_command(store: "LogStore", name: str) -> bool:
    cfg = _load_config(store)
    existed = cfg.get("commands", {}).pop(name, None) is not None
    _save_config(store, cfg)
    return existed


def registered_commands(store: "LogStore") -> dict:
    return _load_config(store).get("commands", {})


def suppress_fingerprint(store: "LogStore", fingerprint: str, command: str = "*") -> None:
    cfg = _load_config(store)
    cfg.setdefault("suppressions", {}).setdefault(command, [])
    if fingerprint not in cfg["suppressions"][command]:
        cfg["suppressions"][command].append(fingerprint)
    _save_config(store, cfg)


def suppressed_fingerprints(store: "LogStore", command: str | None = None) -> list[str]:
    """Union of global (*) and per-command suppressions — feeds the P8
    suppression filter in services.query_events."""
    sup = _load_config(store).get("suppressions", {})
    out = list(sup.get("*", []))
    if command:
        out += [fp for fp in sup.get(command, []) if fp not in out]
    return out


# -- user config (reference UserConfig, src/blq/config.py + cli.py:1021-1067) --
# Dotted keys under the store config's "user" section, e.g.
# `output.default_limit`. Values are JSON scalars; `config_set` parses
# bool/int/float/JSON literals so `blq-spark config set output.default_limit
# 25` stores the integer 25.

# Known keys and their defaults — the schema the `config` command shows.
# Keys here actively change CLI behavior (resolved in cli.main / commands).
USER_CONFIG_SCHEMA: dict[str, object] = {
    "output.format": "table",  # default --format for every command
    "output.default_limit": 10,  # default -n for errors/warnings/history
    "run.default_format": "auto",  # default parse format for run/import
    "clean.max_age_days": None,  # default retention window for clean prune
    # auto-prune after runs (reference _maybe_auto_prune,
    # commands/execution.py + test_autoprune.py): opt-in, throttled
    "clean.auto_prune": False,
    "clean.max_runs": None,  # per-source cap when auto-pruning
    "clean.max_size_mb": None,  # total stored-output cap
    "clean.prune_interval_minutes": 60,  # min gap between auto-prunes
}


def maybe_auto_prune(store: "LogStore") -> int | None:
    """Opportunistic retention after a run (reference autoprune trigger):
    no-op unless `clean.auto_prune` is set AND at least one policy key
    is configured AND the throttle interval has elapsed since the last
    prune (mtime of a marker file — cheap, no table read). Returns runs
    removed, or None when skipped."""
    import time as _time

    if not config_get(store, "clean.auto_prune"):
        return None
    days = config_get(store, "clean.max_age_days")
    max_runs = config_get(store, "clean.max_runs")
    max_mb = config_get(store, "clean.max_size_mb")
    if days is None and max_runs is None and max_mb is None:
        return None
    marker = os.path.join(store.root, "last_prune")
    interval_min = config_get(store, "clean.prune_interval_minutes")
    # explicit 0 means "every run" — `or`-defaulting would eat it
    interval_s = float(60 if interval_min is None else interval_min) * 60
    try:
        if _time.time() - os.path.getmtime(marker) < interval_s:
            return None
    except OSError:
        pass  # no marker yet -> prune now
    n = 0
    if days is not None or max_runs is not None:
        n += store.prune_runs(max_age_days=days, max_runs_per_source=max_runs)
    if max_mb is not None:
        n += store.prune_by_size(int(max_mb) * 1024 * 1024)
    store.cleanup_orphaned_blobs()
    with open(marker, "w") as fh:
        fh.write(str(_time.time()))
    return n


def _parse_config_value(raw: str):
    lowered = raw.strip().lower()
    if lowered in ("true", "false"):
        return lowered == "true"
    if lowered in ("null", "none"):
        return None
    try:
        return json.loads(raw)
    except (ValueError, TypeError):
        return raw


def user_config(store: "LogStore") -> dict:
    """Flat {dotted_key: value} of explicitly-set user config entries."""
    return dict(_load_config(store).get("user", {}))


def config_get(store: "LogStore", key: str):
    """Explicit value if set, else the schema default (None for unknown
    keys — mirroring reference config get's default fallback)."""
    user = _load_config(store).get("user", {})
    if key in user:
        return user[key]
    return USER_CONFIG_SCHEMA.get(key)


def config_set(store: "LogStore", key: str, value: str) -> None:
    cfg = _load_config(store)
    cfg.setdefault("user", {})[key] = _parse_config_value(value)
    _save_config(store, cfg)


def config_unset(store: "LogStore", key: str) -> bool:
    cfg = _load_config(store)
    existed = key in cfg.get("user", {})
    cfg.get("user", {}).pop(key, None)
    _save_config(store, cfg)
    return existed


def _advance_serial_file(root: str, count: int, seed_fn) -> int:
    """Advance the durable `<root>/run_serial` counter by `count` and
    return the first reserved serial. Caller must hold the store-write
    lock. `seed_fn()` supplies the high-water mark when the counter file
    does not exist yet (LogStore seeds from max(run_serial) — one tiny
    dimension scan, once per store lifetime). The write is tmp +
    same-directory os.replace: atomic on local POSIX and NFSv3+ (the
    locks-module multi-host contract)."""
    path = os.path.join(root, "run_serial")
    last = None
    try:
        with open(path) as fh:
            last = int(fh.read().strip())
    except (OSError, ValueError):
        pass
    if last is None:
        last = int(seed_fn())
    os.makedirs(root, exist_ok=True)
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as fh:
        fh.write(str(last + count))
    os.replace(tmp, path)
    return last + 1


def reserve_serials_standalone(root: str, count: int = 1) -> int:
    """Cross-process serial reservation WITHOUT a SparkSession: take the
    store-write file lock and bump the counter. The primitive a
    non-Spark writer (or another host on a shared filesystem) uses to
    claim serial ranges; requires a store that has ingested at least
    once (counter file present). A pre-counter store that already holds
    runs would silently collide on serial 1 if we seeded from 0, so a
    missing counter file is an ERROR here — ingest once (or run the
    Spark-side seed, which derives max(run_serial)) first. Returns the
    first reserved serial; tests/test_multihost_store.py stress-drives
    this from two concurrent processes."""
    from blq_cli_spark.sources import locks as locks_mod

    def _missing_counter() -> int:
        raise FileNotFoundError(
            f"serial counter file absent under {root!r}: "
            "reserve_serials_standalone cannot seed safely on a store "
            "that may already hold runs — ingest once through the Spark "
            "path (which seeds from max(run_serial)) before reserving "
            "standalone serials"
        )

    locks_dir = os.path.join(root, "locks")
    held = locks_mod.acquire_lock_wait(
        locks_dir, _WRITE_LOCK_NAME, str(uuid.uuid4()), "<serial-reserve>",
        timeout=_WRITE_LOCK_WAIT_S,
    )
    try:
        return _advance_serial_file(root, count, _missing_counter)
    finally:
        locks_mod.release_lock(locks_dir, _WRITE_LOCK_NAME, held)

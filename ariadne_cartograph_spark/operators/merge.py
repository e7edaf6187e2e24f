"""Key-matched upsert / MERGE (SURVEY.md §2.1 S4, §2.2 J1).

The reference's sink is `INSERT … ON CONFLICT (gid) DO UPDATE SET col =
excluded.col` (`/root/reference/update_ways_metadata.py:50-54`). With
plain parquet (no Delta in this environment — checked SURVEY.md §4.2),
the engine provides the same semantics as a pure dataflow:

    merged = existing FULL OUTER JOIN updates ON key
             → update cols: coalesce(updates.col, existing.col)
             → other  cols: existing.col

plus an atomic-swap writer for persistence. Per-column upsert matches
the reference exactly: a run that only computes `popularity` must not
null out `greenery` (column-wise coalesce, not row replacement).

Scale: the join shuffles both sides on the key — the same cost Delta
MERGE pays in its join phase; with both tables bucketed by key it
becomes co-located.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_into(
    existing: DataFrame | None,
    updates: DataFrame,
    key: str,
    update_cols: list[str] | None = None,
) -> DataFrame:
    """ON CONFLICT (key) DO UPDATE semantics as a DataFrame transform.

    ``existing`` may be None (first run → pure insert). Columns present
    only in one side are carried through (missing side contributes
    NULL).
    """
    if update_cols is None:
        update_cols = [c for c in updates.columns if c != key]
    if existing is None:
        return updates
    e = existing.alias("e")
    u = updates.select(key, *update_cols).alias("u")
    joined = e.join(u, F.col(f"e.{key}") == F.col(f"u.{key}"), "full_outer")
    out_cols = [F.coalesce(F.col(f"e.{key}"), F.col(f"u.{key}")).alias(key)]
    for c in existing.columns:
        if c == key:
            continue
        if c in update_cols:
            out_cols.append(F.coalesce(F.col(f"u.{c}"), F.col(f"e.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"e.{c}").alias(c))
    for c in update_cols:
        if c not in existing.columns:
            out_cols.append(F.col(f"u.{c}").alias(c))
    return joined.select(*out_cols)


class ParquetMergeTable:
    """A parquet-backed table with upsert + atomic swap — the engine's
    `ways_metadata` sink (`/root/reference/sql/ways_metadata.ddl`).

    Writes go to a fresh directory, then a versioned pointer file flips
    — readers resolve the pointer first, so a crash mid-write never
    corrupts the visible table (snapshot isolation for readers).

    Concurrent writers serialize through optimistic concurrency: a
    writer that read version n may flip the pointer to n+1 only after
    winning an O_EXCL commit marker for that exact transition — the
    same read-version / try-commit / retry-on-conflict protocol Delta
    Lake's commit file implements. Losers re-read the new current
    state, RE-MERGE their updates against it, and compete for the next
    slot, so no upsert is ever silently lost (the failure mode of the
    plain last-writer-wins flip). A crashed winner's marker is taken
    over after ``stale_marker_sec`` if the pointer never advanced.
    Delta/Iceberg replace this wholesale when available.

    Committed snapshots are RETAINED, not deleted at commit: a commit
    only vacuums versions older than the newest ``retain_versions``
    AND older than ``vacuum_grace_sec`` on disk. This is Delta's
    log/file-retention model, and it is load-bearing for concurrency:
    a concurrent reader (or a LOSING writer, whose merge job lazily
    scans the base snapshot while the winner commits) must never have
    parquet files removed underneath a running scan. It also makes
    every retained version readable — ``read(version=n)`` /
    ``history()`` time travel.

    Streaming exactly-once: ``upsert`` takes Delta-style transaction
    identity (``txn_app``, ``txn_version``). Each snapshot records the
    high-water batch id per writer app in a ``_txn.json`` carried
    forward across commits; a replayed ``foreachBatch`` batch id
    (micro-batch retry after sink failure) is detected against the
    then-current snapshot inside the OCC loop and skipped, so
    readStream → foreachBatch(:meth:`streaming_sink`) is effectively
    exactly-once end-to-end.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        stale_marker_sec: float = 60.0,
        retain_versions: int = 2,
        vacuum_grace_sec: float = 600.0,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.stale_marker_sec = stale_marker_sec
        self.retain_versions = max(1, retain_versions)
        self.vacuum_grace_sec = vacuum_grace_sec
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    @property
    def _log(self) -> str:
        """Append-only commit log (one ``<version> <dirname>`` line per
        committed transition, O_APPEND-atomic). The pointer file is the
        atomic 'current' resolution; the log is the version→dir history
        that time travel and vacuum read. A crashed loser's abandoned
        candidate dir is never logged, so it can't masquerade as a
        committed version."""
        return os.path.join(self.path, "_LOG")

    def _current(self) -> tuple[int, str | None]:
        """(version, data dir) of the visible snapshot; (0, None) when
        the table is empty."""
        if not os.path.exists(self._pointer):
            return 0, None
        with open(self._pointer) as f:
            name = f.read().strip()
        d = os.path.join(self.path, name)
        if not os.path.exists(d):
            return 0, None
        try:
            version = int(name.split("_")[1])
        except (IndexError, ValueError):
            version = 1  # pre-versioning layout: treat as v1
        return version, d

    def _current_dir(self) -> str | None:
        return self._current()[1]

    def _logged(self) -> dict[int, str]:
        """version → dirname for every logged commit whose dir still
        exists (vacuumed versions drop out), plus the current pointer
        (covers a winner that crashed between flip and log append)."""
        out: dict[int, str] = {}
        if os.path.exists(self._log):
            with open(self._log) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) == 2 and os.path.exists(
                        os.path.join(self.path, parts[1])
                    ):
                        out[int(parts[0])] = parts[1]
        cur_v, cur_d = self._current()
        if cur_d:
            out[cur_v] = os.path.basename(cur_d)
        return out

    def history(self) -> list[int]:
        """Readable (retained) versions, oldest first."""
        return sorted(self._logged())

    def read(self, version: int | None = None) -> DataFrame | None:
        """Current snapshot, or time-travel to a retained ``version``
        (raises if that version was vacuumed or never committed)."""
        if version is None:
            d = self._current_dir()
            return self.spark.read.parquet(d) if d else None
        logged = self._logged()
        if version not in logged:
            raise ValueError(
                f"version {version} is not readable (retained: "
                f"{sorted(logged)}) — vacuumed or never committed"
            )
        return self.spark.read.parquet(os.path.join(self.path, logged[version]))

    def _txn_state(self, data_dir: str | None) -> dict[str, int]:
        """app-id → high-water txn version recorded in a snapshot
        (underscore-prefixed file: invisible to parquet scans, like
        _SUCCESS)."""
        import json as _json

        if not data_dir:
            return {}
        p = os.path.join(data_dir, "_txn.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return {k: int(v) for k, v in _json.load(f).items()}

    def _try_claim(self, version: int) -> bool:
        """O_EXCL commit marker for the transition into ``version`` —
        at most one writer per slot. Stale markers (winner crashed
        between claim and pointer flip) are taken over after
        ``stale_marker_sec``."""
        import time

        marker = os.path.join(self.path, f"_COMMIT.v{version:09d}")
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(time.time()).encode())
            os.close(fd)
            return True
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(marker)
                cur_v, _ = self._current()
                if age > self.stale_marker_sec and cur_v < version:
                    os.remove(marker)  # crashed winner: free the slot
            except OSError:
                pass
            return False

    def upsert(
        self,
        updates: DataFrame,
        update_cols: list[str] | None = None,
        txn_app: str | None = None,
        txn_version: int | None = None,
    ) -> bool:
        """Merge ``updates`` in with ON-CONFLICT semantics. Retries the
        read-merge-commit cycle on writer conflicts until this writer's
        updates land on top of the then-current snapshot.

        With (``txn_app``, ``txn_version``) the commit is idempotent
        per app: a version at or below the snapshot's recorded
        high-water mark for that app is a replay (e.g. a retried
        ``foreachBatch`` micro-batch) and is skipped — checked against
        the THEN-CURRENT snapshot inside the OCC loop, so the check
        holds even when this writer loses races. Returns True if a
        commit happened, False if skipped as a replay.
        """
        import json as _json
        import time

        if (txn_app is None) != (txn_version is None):
            raise ValueError("txn_app and txn_version go together")
        while True:
            base_version, base_dir = self._current()
            txn = self._txn_state(base_dir)
            if txn_app is not None:
                if txn.get(txn_app, -1) >= txn_version:
                    return False  # replayed batch: already committed
                txn = dict(txn)
                txn[txn_app] = txn_version
            existing = self.spark.read.parquet(base_dir) if base_dir else None
            merged = merge_into(existing, updates, self.key, update_cols)
            new_version = base_version + 1
            new_dir = f"v_{new_version:09d}_{uuid.uuid4().hex[:12]}"
            merged.write.mode("overwrite").parquet(os.path.join(self.path, new_dir))
            if txn:
                with open(os.path.join(self.path, new_dir, "_txn.json"), "w") as f:
                    _json.dump(txn, f)
            if not self._try_claim(new_version):
                # another writer won this transition: discard our
                # candidate, wait for their flip, re-merge on top
                shutil.rmtree(
                    os.path.join(self.path, new_dir), ignore_errors=True
                )
                deadline = time.time() + self.stale_marker_sec + 5.0
                while self._current()[0] < new_version and time.time() < deadline:
                    time.sleep(0.05)
                continue
            # we own the n→n+1 transition; pointer is still at n
            tmp = self._pointer + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                f.write(new_dir)
            os.replace(tmp, self._pointer)  # atomic flip
            with open(self._log, "a") as f:
                f.write(f"{new_version} {new_dir}\n")  # O_APPEND atomic line
            self.vacuum()
            return True

    def vacuum(
        self,
        retain_versions: int | None = None,
        grace_sec: float | None = None,
    ) -> list[int]:
        """Remove snapshot dirs older than the newest ``retain_versions``
        AND older than ``grace_sec`` on disk (both conditions — the
        grace age is what guarantees no running scan, reader or losing
        writer, has its files deleted underneath it). Also sweeps
        abandoned candidate dirs from crashed losers (unlogged,
        unclaimed, past the grace age) and commit markers of vacuumed
        transitions. Returns the vacuumed versions."""
        import time

        retain = self.retain_versions if retain_versions is None else max(
            1, retain_versions
        )
        grace = self.vacuum_grace_sec if grace_sec is None else grace_sec
        cur_v, cur_d = self._current()
        logged = self._logged()
        now = time.time()
        removed: list[int] = []
        for v, name in logged.items():
            d = os.path.join(self.path, name)
            if d == cur_d or v > cur_v - retain:
                continue
            try:
                if now - os.path.getmtime(d) <= grace:
                    continue
            except OSError:
                continue
            shutil.rmtree(d, ignore_errors=True)
            removed.append(v)
            marker = os.path.join(self.path, f"_COMMIT.v{v:09d}")
            if os.path.exists(marker):
                os.remove(marker)
        # crashed losers' abandoned candidates: v_* dirs never logged
        known = {n for n in logged.values()}
        for name in os.listdir(self.path):
            d = os.path.join(self.path, name)
            if (
                name.startswith("v_")
                and os.path.isdir(d)
                and name not in known
                and d != cur_d
            ):
                try:
                    if now - os.path.getmtime(d) > max(grace, self.stale_marker_sec):
                        shutil.rmtree(d, ignore_errors=True)
                except OSError:
                    pass
        return sorted(removed)

    def streaming_sink(self, app_id: str, update_cols: list[str] | None = None):
        """``foreachBatch`` target with exactly-once upsert semantics:
        ``df.writeStream.foreachBatch(table.streaming_sink("my-app"))``.
        The micro-batch id becomes the txn version, so a batch replayed
        after a sink-side failure (Structured Streaming's at-least-once
        contract for foreachBatch) is detected and skipped."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.upsert(
                batch_df,
                update_cols=update_cols,
                txn_app=app_id,
                txn_version=int(batch_id),
            )

        return _sink


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """CDC-style snapshot diff: classify every key across two table
    versions as ``insert`` / ``delete`` / ``update`` / ``unchanged``
    (the change feed a downstream incremental consumer replays; the
    reverse direction of the upsert MERGE above).

    One full-outer join on the key — the minimum data movement for a
    diff; comparison is null-safe (``eqNullSafe``) so NULL→value and
    value→NULL edits classify as updates, not unchanged. At scale both
    snapshots bucket by the key and the join is co-located.

    Output: (key, change, <old_/new_ compare cols>).
    """
    o = old.select(F.col(key), *[F.col(c).alias(f"old_{c}") for c in compare_cols])
    n = new.select(F.col(key), *[F.col(c).alias(f"new_{c}") for c in compare_cols])
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    # presence markers: a row exists on a side iff ANY of its selected
    # columns is non-null OR the side matched (full_outer keeps key);
    # use explicit indicator columns to be null-safe even when all
    # compare cols are legitimately NULL.
    o_marked = o.withColumn("__in_old", F.lit(1))
    n_marked = n.withColumn("__in_new", F.lit(1))
    joined = o_marked.join(n_marked, key, "full_outer")
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    return joined.select(
        F.col(key),
        change.alias("change"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )

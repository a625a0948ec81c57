"""Checkpoint catalog: parquet-backed stage tables with atomic commit
markers and per-partition lineage rows.

Generalizes the reference's resume contract — keyset bookmarks +
``hash IS NULL`` work-queue predicates (/root/reference/files/
hash.go:202-283) and batched transactions (find.go:125, prune.go:44)
— into Spark-native terms: each stage writes its whole output, then a
commit marker stamped with the config's params_hash; a killed job
rerun skips every committed stage and (for incremental stages)
anti-joins the frontier against its own completed output.

On a production cluster this catalog is an Iceberg/Delta catalog
(atomic snapshot commits, hidden partitioning); those jars are not in
this image, so the same contract is implemented over parquet dirs +
JSON markers behind one small interface — the pipeline code does not
care which backend it gets.

Interface → Iceberg mapping (keep new call sites inside this contract
so an Iceberg backend is a drop-in):

- ``write(mode="overwrite")``  → ``REPLACE TABLE ... AS SELECT`` /
  overwrite snapshot commit (here: temp dir + atomic rename; marker
  removed first, written last — same crash window as a snapshot swap).
- ``write(mode="append")``     → fast-append snapshot commit (here:
  parquet append; the params sidecar written by ``incremental_begin``
  plays the role of table properties stamped on the first append).
- commit marker (``_*_COMMIT.json``) → the snapshot id + summary; a
  table without a current marker is a mid-write table (resume wipes or
  frontier-fills it, never trusts it).
- ``upstream_rows`` fingerprint in ``is_complete`` → upstream snapshot
  id comparison (snapshot diff); row counts are the parquet stand-in
  with the same semantics under the append-only contract.
- ``table_rows`` → ``snapshot.summary["total-records"]`` (here:
  parquet footers; metadata either way, never a scan job).
- lineage rows per output file → per-data-file manifest entries plus
  the engine's (run_id, stage, wall_ms, params_hash) annotations.
- ``incremental_begin`` wipe-on-params-change → ``DELETE FROM`` /
  truncate + property restamp in one transaction.
- ``current_files`` / ``appended_since`` → the snapshot file manifest
  and Iceberg's incremental snapshot read (``incremental-from-
  snapshot-id``): a consumer records the producer's file list in a
  bookmark at commit time and later reads ONLY files appended since —
  a frontier-proportional scan, never a full-table distinct.
- ``write(mode="cow", partition_by=[...])`` → Iceberg copy-on-write
  ``MERGE INTO`` / ``INSERT OVERWRITE`` with dynamic partition
  overwrite: the DataFrame carries the full new content of the
  partitions it touches; untouched partitions' immutable data files
  are carried into the new snapshot unrewritten (here: hardlinked
  into the swap dir — same inode, no data copy). Lineage rows are
  emitted only for the NEW files (manifest entries), so per-tick
  lineage is proportional to the touched partitions.
- ``write_bookmark`` / ``read_bookmark`` → consumer-side snapshot ids
  stored as table properties (here: an atomic JSON sidecar).

Lineage rows are per output *file* (the local stand-in for a
partition): (run_id, stage, partition, rows, bytes, wall_ms,
params_hash, completed_at) — the north rule's per-partition metrics.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

import pyarrow.dataset as pads
import pyarrow.parquet as papq
from pyspark.sql import DataFrame, SparkSession


@dataclass
class CommitInfo:
    stage: str
    run_id: str
    params_hash: str
    rows: int
    wall_ms: int
    completed_at: float
    # upstream table row counts at commit time (the snapshot-diff
    # stand-in): a stage whose upstream grew since its commit is stale
    # even under identical params. None = recorded before this field
    # existed (treated as unknown → stale when a check is requested).
    upstream_rows: dict | None = None


class CheckpointCatalog:
    def __init__(self, root: str, run_id: str | None = None) -> None:
        self.root = root
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(root, exist_ok=True)
        # read-resolution cache: (app_id, data-file fingerprint, df) per
        # table — see read()
        self._read_cache: dict[str, tuple[str, tuple, object]] = {}

    # -- paths ------------------------------------------------------------
    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _marker(self, name: str) -> str:
        return os.path.join(self.root, f"_{name}_COMMIT.json")

    def _lineage_dir(self) -> str:
        d = os.path.join(self.root, "_lineage")
        os.makedirs(d, exist_ok=True)
        return d

    # -- queries ----------------------------------------------------------
    def commit_info(self, name: str) -> CommitInfo | None:
        m = self._marker(name)
        if not os.path.exists(m):
            return None
        with open(m) as f:
            return CommitInfo(**json.load(f))

    def is_complete(
        self,
        name: str,
        params_hash: str,
        upstream_rows: dict | None = None,
    ) -> bool:
        """Committed under these params — and, when ``upstream_rows`` is
        given, committed against exactly this upstream state (row-count
        fingerprint per dependency table; on Iceberg this is a snapshot
        id comparison)."""
        info = self.commit_info(name)
        if info is None or info.params_hash != params_hash:
            return False
        if upstream_rows is not None and info.upstream_rows != upstream_rows:
            return False
        return True

    def _dir_fingerprint(self, name: str) -> tuple:
        """Sorted relative names of the table's data files, from a local
        directory walk (~ms). Deliberately NOT the frags sidecar: a kill
        mid-append leaves orphan data files the sidecar doesn't know
        about, and the resume defence (frontier anti-join against the
        table's actual contents) must see them."""
        path = self.table_path(name)
        out = []
        for dirpath, _dirs, files in os.walk(path):
            for fn in files:
                if fn.startswith(("_", ".")):
                    continue
                out.append(os.path.relpath(os.path.join(dirpath, fn), path))
        return tuple(sorted(out))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """Resolve the table to a DataFrame, cached per (session, data
        files). Each ``spark.read.parquet`` pays ~0.2 s of driver-side
        source resolution (file listing + schema inference; ~1.4 s for
        a partitioned cow table) — a FIXED cost identical at every
        parallelism level, so repeated resolutions of an unchanged
        table directly tax scaling efficiency. The cache key is the
        actual data-file set (directory walk, not the manifest
        sidecar), so any append/overwrite/cow — including orphan files
        from a killed append — changes the key and forces a fresh
        resolution. On Iceberg this is the table's current snapshot id."""
        app = spark.sparkContext.applicationId
        fp = self._dir_fingerprint(name)
        hit = self._read_cache.get(name)
        if hit is not None and hit[0] == app and hit[1] == fp:
            return hit[2]
        df = spark.read.parquet(self.table_path(name))
        self._read_cache[name] = (app, fp, df)
        return df

    def exists(self, name: str) -> bool:
        return os.path.exists(self.table_path(name))

    def table_rows(self, name: str) -> int:
        """Row count from parquet footers — metadata only, no scan job.
        Prefers the commit marker (already totalled); falls back to
        footers for a table whose marker was lost to a mid-write kill."""
        info = self.commit_info(name)
        if info is not None:
            return info.rows
        if not self.exists(name):
            return 0
        ds = pads.dataset(self.table_path(name), format="parquet")
        return sum(
            (f.metadata.num_rows if getattr(f, "metadata", None) is not None else f.count_rows())
            for f in ds.get_fragments()
        )

    def drop(self, name: str) -> None:
        self._read_cache.pop(name, None)
        path = self.table_path(name)
        if os.path.exists(path):
            shutil.rmtree(path)
        for side in (self._marker(name), self._params_sidecar(name),
                     self._frags_sidecar(name), self._bookmark(name)):
            if os.path.exists(side):
                os.remove(side)

    # -- snapshot file manifest + incremental reads ------------------------
    def current_files(self, name: str) -> list[str]:
        """The table's data-file basenames — the snapshot manifest.
        Metadata only: served from the frags sidecar written at commit
        time; falls back to a directory listing for a table written
        outside ``write`` (e.g. a raw append from a killed run)."""
        side = self._frags_sidecar(name)
        if os.path.exists(side):
            with open(side) as f:
                return json.load(f)
        if not self.exists(name):
            return []
        ds = pads.dataset(self.table_path(name), format="parquet")
        return sorted(
            os.path.relpath(f.path, self.table_path(name)) for f in ds.get_fragments()
        )

    def read_files(self, spark: SparkSession, name: str,
                   files: list[str]) -> DataFrame:
        """Read exactly these data files of ``name`` (relative names as
        returned by ``current_files``). An empty list yields an empty
        DataFrame with the table's schema."""
        root = self.table_path(name)
        if not files:
            return self.read(spark, name).limit(0)
        # basePath keeps hive partition columns recoverable when the
        # selected files live under partition dirs (cow tables)
        return spark.read.option("basePath", root).parquet(
            *[os.path.join(root, b) for b in sorted(files)]
        )

    def appended_since(self, spark: SparkSession, name: str,
                       seen_files: list[str]) -> DataFrame:
        """Iceberg incremental snapshot read, parquet-dir stand-in:
        the rows of ``name`` appended since a consumer recorded
        ``seen_files`` (its bookmark of the producer's manifest). Under
        the append-only contract files are immutable, so new-files ≡
        new-rows; the scan touches ONLY the appended files — the
        frontier — never the standing table."""
        seen = set(seen_files)
        new = [b for b in self.current_files(name) if b not in seen]
        return self.read_files(spark, name, new)

    # -- consumer bookmarks ------------------------------------------------
    # A consumer stage records the manifest of each producer it has fully
    # processed (plus its params hash) — the snapshot-id bookmark of an
    # Iceberg incremental read. Written AFTER the consumer's own commit;
    # a kill in between leaves a stale bookmark, which is safe: the next
    # run re-derives a superset frontier and idempotent anti-joins /
    # relabels absorb the overlap.
    def _bookmark(self, name: str) -> str:
        return os.path.join(self.root, f"_{name}_BOOKMARK.json")

    def write_bookmark(self, name: str, payload: dict) -> None:
        side = self._bookmark(name)
        with open(side + ".tmp", "w") as f:
            json.dump(payload, f)
        os.replace(side + ".tmp", side)

    def read_bookmark(self, name: str) -> dict | None:
        side = self._bookmark(name)
        if not os.path.exists(side):
            return None
        with open(side) as f:
            return json.load(f)

    def drop_bookmark(self, name: str) -> None:
        side = self._bookmark(name)
        if os.path.exists(side):
            os.remove(side)

    # -- incremental-table params sidecar ----------------------------------
    # An append-mode (incremental) table accumulates data across runs; its
    # rows are only reusable if they were produced under the same params.
    # The sidecar is written BEFORE the first append of a run so a killed
    # run can still be classified on resume.
    def _params_sidecar(self, name: str) -> str:
        return os.path.join(self.root, f"_{name}_PARAMS.json")

    def incremental_begin(self, name: str, params_hash: str) -> None:
        """Ensure the incremental table is reusable under ``params_hash``;
        wipe it if it was built under different params."""
        side = self._params_sidecar(name)
        current = None
        if os.path.exists(side):
            with open(side) as f:
                current = json.load(f).get("params_hash")
        if current != params_hash and self.exists(name):
            self.drop(name)
        with open(side + ".tmp", "w") as f:
            json.dump({"params_hash": params_hash, "run_id": self.run_id}, f)
        os.replace(side + ".tmp", side)

    # -- writes -----------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        name: str,
        params_hash: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        upstream_rows: dict | None = None,
    ) -> CommitInfo:
        """Write a stage output + commit marker + lineage rows.

        overwrite goes through a temp dir + atomic rename so a kill
        mid-write never leaves a half-table behind a valid marker
        (marker is removed first, written last)."""
        t0 = time.time()
        path = self.table_path(name)
        marker = self._marker(name)
        if os.path.exists(marker):
            os.remove(marker)

        if mode in ("overwrite", "cow"):
            # clean ALL orphaned temp dirs for this table, not just this
            # run's: a kill between tmp-write and rename leaves a
            # full-size copy under a dead run_id that no later run would
            # otherwise touch (the catalog is single-writer by contract,
            # so any existing tmp-* is garbage)
            import glob as _glob

            for stale in _glob.glob(path + ".tmp-*"):
                shutil.rmtree(stale, ignore_errors=True)
            tmp = path + f".tmp-{self.run_id}"
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(tmp)
            if partition_by and not any(
                e.startswith(f"{partition_by[0]}=") for e in os.listdir(tmp)
            ) and not (mode == "cow" and os.path.exists(path)):
                # empty partitioned write emits no data files (only
                # _SUCCESS) — unreadable. Re-write plain so the schema
                # survives (the partition column becomes a regular
                # column of the one empty file). NOT for an empty cow
                # tick over an existing table: a plain file would mix
                # with the carried-forward hive dirs into an unreadable
                # layout — there the carry-forward below reproduces the
                # prior snapshot verbatim (every partition unchanged).
                shutil.rmtree(tmp)
                df.write.mode("overwrite").parquet(tmp)
            if mode == "cow" and os.path.exists(path):
                # copy-on-write: partitions present in the new data are
                # replaced; every other partition's immutable files are
                # carried forward into the new snapshot by hardlink —
                # no data copy, identical inodes, same relative names
                # (so their lineage rows are not re-emitted). The
                # Iceberg analog is a dynamic-partition-overwrite
                # snapshot referencing the untouched data files.
                replaced = {
                    e for e in os.listdir(tmp)
                    if partition_by and e.startswith(f"{partition_by[0]}=")
                }
                for entry in os.listdir(path):
                    if not partition_by or not entry.startswith(
                        f"{partition_by[0]}="
                    ) or entry in replaced:
                        continue
                    src_dir = os.path.join(path, entry)
                    if not os.path.isdir(src_dir):
                        continue
                    dst_dir = os.path.join(tmp, entry)
                    os.makedirs(dst_dir, exist_ok=True)
                    for fn in os.listdir(src_dir):
                        if fn.startswith(("_", ".")):
                            continue
                        os.link(os.path.join(src_dir, fn),
                                os.path.join(dst_dir, fn))
            if os.path.exists(path):
                shutil.rmtree(path)
            os.rename(tmp, path)
        elif mode == "append":
            w = df.write.mode("append")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(path)
        else:
            raise ValueError(mode)

        wall_ms = int((time.time() - t0) * 1000)
        # cow keeps the old manifest sidecar (reset=False) so lineage
        # rows are emitted ONLY for newly written files — the carried-
        # forward hardlinks keep their relative names and stay recorded
        rows = self._record_lineage(name, params_hash, wall_ms, reset=(mode == "overwrite"))
        info = CommitInfo(
            stage=name,
            run_id=self.run_id,
            params_hash=params_hash,
            rows=rows,
            wall_ms=wall_ms,
            completed_at=time.time(),
            upstream_rows=upstream_rows,
        )
        with open(marker + ".tmp", "w") as f:
            json.dump(info.__dict__, f)
        os.replace(marker + ".tmp", marker)
        return info

    def _frags_sidecar(self, name: str) -> str:
        return os.path.join(self.root, f"_{name}_FRAGS.json")

    def _record_lineage(self, name: str, params_hash: str, wall_ms: int,
                        reset: bool = True) -> int:
        """Per-output-file row counts from parquet footers (metadata-only
        read — no data scan). Returns the table's TOTAL rows.

        Lineage rows are emitted only for files not recorded before
        (tracked in a per-table sidecar, reset on overwrite): an
        append-mode tick would otherwise re-record every prior tick's
        files — duplicated lineage rows, re-attributed to the wrong
        run/wall, quadratic over a long incremental backfill."""
        import pyarrow as pa

        path = self.table_path(name)
        side = self._frags_sidecar(name)
        seen: set[str] = set()
        if not reset and os.path.exists(side):
            with open(side) as f:
                seen = set(json.load(f))
        frags = []
        total = 0
        all_names = []
        ds = pads.dataset(path, format="parquet")
        for frag in ds.get_fragments():
            md = frag.metadata if hasattr(frag, "metadata") else None
            nrows = md.num_rows if md is not None else frag.count_rows()
            # relative path, not basename: partitioned (cow) tables keep
            # their files under partition dirs, and the manifest must
            # round-trip through read_files
            base = os.path.relpath(frag.path, path)
            total += nrows
            all_names.append(base)
            if base in seen:
                continue
            frags.append(
                {
                    "run_id": self.run_id,
                    "stage": name,
                    "partition": base,
                    "rows": nrows,
                    "bytes": os.path.getsize(frag.path) if os.path.exists(frag.path) else 0,
                    "wall_ms": wall_ms,
                    "params_hash": params_hash,
                    "completed_at": time.time(),
                }
            )
        if frags:
            table = pa.Table.from_pylist(frags)
            out = os.path.join(
                self._lineage_dir(), f"{name}-{self.run_id}-{uuid.uuid4().hex[:8]}.parquet"
            )
            papq.write_table(table, out)
        with open(side + ".tmp", "w") as f:
            json.dump(sorted(all_names), f)
        os.replace(side + ".tmp", side)
        return total

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._lineage_dir())

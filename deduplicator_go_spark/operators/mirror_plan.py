"""Group-mirror task planner (reference J7 — its most intricate query).

Re-expresses /root/reference/files/group_mirror.go as one declarative
DataFrame plan:
- per-hash size consistency (group_mirror.go:294-301),
- target-path election by popularity with most-populated-member and
  lexicographic tie-breaks (chooseGroupMirrorPath, :381-425),
- source-member election among holders of the chosen path
  (chooseGroupMirrorSource, :427-449),
- per-missing-member copy tasks with destination-occupied and
  already-planned conflict detection (planGroupMirrorTasks, :281-362,
  occupied check :330-338),
- path sanitation equivalent to filepath.Clean + the unsafe-path
  rejections (cleanGroupMirrorRelPath, :452-462) as a native array
  fold — no Python in the row path.

The reference resolves planned-destination collisions by iterating
hashes in ascending order and letting the first hash claim a
(member, path) slot (:283-289 sort, :340-349 plannedDestPaths); the
distributed equivalent is a window rank over (dst_member, clean_path)
ordered by hash — same deterministic winner, no sequential state.

Scale shape: everything keys on hash / (hash, path) / (member, path) —
equi-join + window shuffles only; the members table (one row per
mirror member) is broadcast. No driver-side loops, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

REASON_SIZE = "same hash has conflicting sizes"
REASON_UNSAFE = "unsafe relative path"
REASON_OCCUPIED = "destination path is already indexed with different hash"
REASON_PLANNED = "destination path is already planned for different hash"


def member_file_counts(catalog: DataFrame, member_col: str = "member") -> DataFrame:
    """(member, file_count) — reference countGroupMirrorMemberFiles
    (group_mirror.go:222-234)."""
    return catalog.groupBy(F.col(member_col).alias("member")).agg(
        F.count("*").alias("file_count")
    )


def clean_rel_path(col):
    """filepath.Clean-equivalent native expression → cleaned path, or
    NULL when unsafe (empty / absolute / escaping via '..'), mirroring
    cleanGroupMirrorRelPath (group_mirror.go:452-462).

    Segments are folded over an array stack: '' and '.' drop, '..'
    pops a non-'..' top (never popping past the root — a leading '..'
    survives and marks the path unsafe)."""
    trimmed = F.regexp_replace(col, r"^\s+|\s+$", "")
    segs = F.filter(F.split(trimmed, "/"), lambda s: (s != "") & (s != "."))
    stack = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (s == "..") & (F.size(acc) > 0) & (F.element_at(acc, -1) != ".."),
            F.slice(acc, F.lit(1), F.size(acc) - 1),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    cleaned = F.array_join(stack, "/")
    unsafe = (
        (trimmed == "") | trimmed.startswith("/") | (F.size(stack) == 0)
        | (F.element_at(stack, 1) == "..")
    )
    return F.when(~unsafe, cleaned)


def group_mirror_plan(
    catalog: DataFrame,
    members: DataFrame | None = None,
    member_col: str = "member",
    path_col: str = "relpath",
    hash_col: str = "hash",
    size_col: str = "size",
) -> tuple[DataFrame, DataFrame]:
    """→ (tasks, conflicts).

    ``catalog``: one row per (member, relpath, hash, size) — the
    per-member file index restricted to the mirror group.
    ``members``: (member, file_count); derived from the catalog when
    omitted (members with zero files then don't exist, matching the
    reference's resolve-from-DB behavior for empty shares only when
    passed explicitly).

    tasks:     (hash, size, rel_path, src_member, dst_member)
    conflicts: (hash, rel_path, member, reason)
    """
    cat = catalog.select(
        F.col(member_col).alias("member"),
        F.col(path_col).alias("relpath"),
        F.col(hash_col).alias("hash"),
        F.col(size_col).cast("long").alias("size"),
    )
    if members is None:
        members = member_file_counts(cat)
    members = F.broadcast(members.select("member", F.col("file_count").cast("long")))
    cat = cat.join(members, "member")  # attach holder file_count

    # --- 1. size consistency per hash (group_mirror.go:294-301) ---------
    size_check = cat.groupBy("hash").agg(
        F.count_distinct("size").alias("n_sizes"), F.min("size").alias("size")
    )
    size_conflicts = size_check.filter("n_sizes > 1").select(
        "hash",
        F.lit(None).cast("string").alias("rel_path"),
        F.lit(None).cast("string").alias("member"),
        F.lit(REASON_SIZE).alias("reason"),
    )
    good = cat.join(size_check.filter("n_sizes = 1").select("hash", "size"),
                    ["hash", "size"])

    # --- 2. target-path election (chooseGroupMirrorPath :381-425) -------
    # per (hash, path): copies + the most-populated holder; winner by
    # (copies desc, best holder file_count desc, path asc)
    path_stats = good.groupBy("hash", "relpath").agg(
        F.count("*").alias("copies"), F.max("file_count").alias("best_fc")
    )
    w_path = Window.partitionBy("hash").orderBy(
        F.desc("copies"), F.desc("best_fc"), F.asc("relpath")
    )
    elected = (
        path_stats.withColumn("prk", F.row_number().over(w_path))
        .filter("prk = 1")
        .select("hash", F.col("relpath").alias("raw_path"))
        .withColumn("clean_path", clean_rel_path(F.col("raw_path")))
    )
    unsafe_conflicts = elected.filter(F.col("clean_path").isNull()).select(
        "hash",
        F.col("raw_path").alias("rel_path"),
        F.lit(None).cast("string").alias("member"),
        F.lit(REASON_UNSAFE).alias("reason"),
    )
    elected = elected.filter(F.col("clean_path").isNotNull())

    # --- 3. source election (chooseGroupMirrorSource :427-449) ----------
    # holders of the chosen raw path, best by (file_count desc, member asc)
    w_src = Window.partitionBy("hash").orderBy(F.desc("file_count"), F.asc("member"))
    sources = (
        good.join(elected.withColumnsRenamed({"raw_path": "relpath"}),
                  ["hash", "relpath"])
        .withColumn("srk", F.row_number().over(w_src))
        .filter("srk = 1")
        .select("hash", "size", F.col("relpath").alias("rel_path"),
                "clean_path", F.col("member").alias("src_member"))
    )

    # --- 4. missing members per hash (presence anti-join, :317-323) -----
    presence = good.select("hash", "member").distinct()
    targets = (
        sources.crossJoin(members.select(F.col("member").alias("dst_member")))
        .join(
            presence.withColumnsRenamed({"member": "dst_member"}),
            ["hash", "dst_member"],
            "left_anti",
        )
    )

    # --- 5. destination-occupied check (:330-338) ------------------------
    # normalize the catalog side through the same path cleaner as the
    # elected clean_path: an uncleaned equivalent ('docs/./x') must
    # still collide with the elected 'docs/x'
    occupied = cat.select(
        F.col("member").alias("dst_member"),
        clean_rel_path(F.col("relpath")).alias("clean_path"),
        F.col("hash").alias("existing_hash"),
    ).distinct()
    with_occ = targets.join(occupied, ["dst_member", "clean_path"], "left")
    occupied_conflicts = with_occ.filter(
        F.col("existing_hash").isNotNull() & (F.col("existing_hash") != F.col("hash"))
    ).select(
        "hash",
        F.col("clean_path").alias("rel_path"),
        F.col("dst_member").alias("member"),
        F.lit(REASON_OCCUPIED).alias("reason"),
    ).distinct()
    free = (
        with_occ.groupBy("hash", "size", "rel_path", "clean_path",
                         "src_member", "dst_member")
        .agg(F.max(
            (F.col("existing_hash").isNotNull()
             & (F.col("existing_hash") != F.col("hash"))).cast("int")
        ).alias("occ"))
        .filter("occ = 0")
        .drop("occ")
    )

    # --- 6. planned-destination collision (:340-349): per (member, path)
    # the ascending-hash winner plans the task, later hashes conflict ----
    w_plan = Window.partitionBy("dst_member", "clean_path").orderBy(F.asc("hash"))
    ranked = free.withColumn("hrk", F.dense_rank().over(w_plan))
    tasks = ranked.filter("hrk = 1").select(
        "hash", "size", F.col("clean_path").alias("rel_path"),
        "src_member", "dst_member",
    )
    planned_conflicts = ranked.filter("hrk > 1").select(
        "hash",
        F.col("clean_path").alias("rel_path"),
        F.col("dst_member").alias("member"),
        F.lit(REASON_PLANNED).alias("reason"),
    )

    conflicts = (
        size_conflicts.unionByName(unsafe_conflicts)
        .unionByName(occupied_conflicts)
        .unionByName(planned_conflicts)
    )
    return tasks, conflicts

"""Persisted path-group policy tables + management verbs.

Parity with the reference's policy schema and `manage` command surface
(/root/reference/migrations/000005_add_path_groups.up.sql,
/root/reference/cmd/manage.go:313-430, db.CreatePathGroup et al.,
scenarios in /root/reference/test/scenarios/host-and-path-management.md):

- ``path_groups``        (group_name UNIQUE, description, min_copies,
                          max_copies NULLable, created_at)
- ``path_group_members`` (group_name, host_name, friendly_path,
                          priority; UNIQUE(host_name, friendly_path) —
                          a path belongs to at most one group;
                          group delete cascades its members)

Both tables are policy metadata — a handful of rows managed from the
driver and *broadcast* into the data path (elect_keepers_priority,
group_mirror_plan). CRUD goes through the checkpoint catalog so the
same atomic-commit semantics cover policy edits: a killed manage verb
never leaves a half-written policy table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import CheckpointCatalog

GROUPS_TABLE = "path_groups"
MEMBERS_TABLE = "path_group_members"

_GROUPS_SCHEMA = (
    "group_name string, description string, min_copies int, "
    "max_copies int, created_at timestamp"
)
_MEMBERS_SCHEMA = (
    "group_name string, host_name string, friendly_path string, priority int"
)


class PolicyError(ValueError):
    pass


class PolicyStore:
    def __init__(self, spark: SparkSession, catalog: CheckpointCatalog) -> None:
        self.spark = spark
        self.catalog = catalog

    # -- reads -------------------------------------------------------------
    def groups(self) -> DataFrame:
        if self.catalog.exists(GROUPS_TABLE):
            return self.catalog.read(self.spark, GROUPS_TABLE)
        return self.spark.createDataFrame([], _GROUPS_SCHEMA)

    def members(self, group: str | None = None) -> DataFrame:
        if self.catalog.exists(MEMBERS_TABLE):
            df = self.catalog.read(self.spark, MEMBERS_TABLE)
        else:
            df = self.spark.createDataFrame([], _MEMBERS_SCHEMA)
        return df.filter(F.col("group_name") == group) if group else df

    def group_show(self, name: str) -> dict:
        rows = self.groups().filter(F.col("group_name") == name).collect()
        if not rows:
            raise PolicyError(f"path group '{name}' not found")
        g = rows[0].asDict()
        g["members"] = [r.asDict() for r in
                        self.members(name).orderBy("priority", "host_name").collect()]
        return g

    # -- writes ------------------------------------------------------------
    def group_add(
        self,
        name: str,
        description: str = "",
        min_copies: int = 2,
        max_copies: int | None = None,
    ) -> None:
        """manage group-add (cmd/manage.go:313-343); name is UNIQUE."""
        existing = self.groups()
        if existing.filter(F.col("group_name") == name).limit(1).count():
            raise PolicyError(f"path group '{name}' already exists")
        row = self.spark.createDataFrame(
            [(name, description, min_copies, max_copies)],
            "group_name string, description string, min_copies int, max_copies int",
        ).withColumn("created_at", F.current_timestamp())
        self.catalog.write(existing.unionByName(row), GROUPS_TABLE, params_hash="policy")

    def group_delete(self, name: str) -> None:
        """manage group-delete (cmd/manage.go:365-375); cascades members
        (ON DELETE CASCADE in migration 000005)."""
        groups = self.groups()
        if not groups.filter(F.col("group_name") == name).limit(1).count():
            raise PolicyError(f"path group '{name}' not found")
        self.catalog.write(
            groups.filter(F.col("group_name") != name), GROUPS_TABLE, params_hash="policy"
        )
        self.catalog.write(
            self.members().filter(F.col("group_name") != name),
            MEMBERS_TABLE, params_hash="policy",
        )

    def group_add_path(
        self, group: str, host: str, friendly_path: str, priority: int = 100
    ) -> None:
        """manage group-add-path (cmd/manage.go:376-398);
        UNIQUE(host_name, friendly_path) across all groups."""
        if not self.groups().filter(F.col("group_name") == group).limit(1).count():
            raise PolicyError(f"path group '{group}' not found")
        existing = self.members()
        clash = existing.filter(
            (F.col("host_name") == host) & (F.col("friendly_path") == friendly_path)
        ).limit(1).count()
        if clash:
            raise PolicyError(
                f"path '{host}:{friendly_path}' already belongs to a group"
            )
        row = self.spark.createDataFrame(
            [(group, host, friendly_path, priority)], _MEMBERS_SCHEMA
        )
        self.catalog.write(existing.unionByName(row), MEMBERS_TABLE, params_hash="policy")

    def group_remove_path(self, host: str, friendly_path: str) -> None:
        """manage group-remove-path (cmd/manage.go:400-410)."""
        existing = self.members()
        keep = existing.filter(
            ~((F.col("host_name") == host) & (F.col("friendly_path") == friendly_path))
        )
        if keep.count() == existing.count():
            raise PolicyError(f"path '{host}:{friendly_path}' is not in any group")
        self.catalog.write(keep, MEMBERS_TABLE, params_hash="policy")

    # -- integration with the keeper/mirror operators -----------------------
    def keeper_policy(self, group: str) -> tuple[DataFrame, int, int | None]:
        """(policy_members(domain, priority), min_copies, max_copies) —
        the shape elect_keepers_priority consumes (broadcast join side)."""
        g = self.group_show(group)
        pm = self.members(group).select(
            F.col("host_name").alias("domain"), "priority"
        )
        return pm, g["min_copies"], g["max_copies"]

"""End-to-end near-duplicate pipeline with checkpointed, resumable stages.

Stage graph (each box = a committed catalog table + lineage rows):

  documents ──► exact_sigs ──► exact_edges ─────────────┐
       │                                                ▼
       ├──► minhash_sigs ──► candidates ──► verified ──► edges ──► clusters
       │         (incremental append)                              │
       └──► substr_pairs (anchor → blocked candidates → verify)    ▼
                                                              dup_report

Resume contract (north rule; generalizes the reference's keyset
bookmarks, /root/reference/files/hash.go:202-283): a killed run
re-invoked with the same catalog + config skips every stage whose
commit marker matches the config's params_hash; the minhash stage is
additionally *incremental* — it anti-joins the input frontier against
its own completed output and appends only missing urls, the Spark
analog of the reference's ``hash IS NULL`` work queue
(files/hash.go:27-33).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..operators import exact
from ..operators.components import assign_all, connected_components
from ..operators.lsh import band_table, candidate_pairs
from ..operators.minhash import minhash_signatures
from ..operators.suffix import substr_pairs
from ..operators.verify import verify_pairs
from ..sources.catalog import CheckpointCatalog


@dataclass
class StageResult:
    name: str
    skipped: bool
    rows: int
    wall_ms: int


@dataclass
class PipelineReport:
    run_id: str
    stages: list[StageResult] = field(default_factory=list)
    docs_in: int = 0
    wall_sec: float = 0.0

    def docs_per_sec(self) -> float:
        return self.docs_in / self.wall_sec if self.wall_sec else 0.0


class DedupPipeline:
    def __init__(
        self,
        spark: SparkSession,
        catalog: CheckpointCatalog,
        config: DedupConfig | None = None,
        with_substr: bool = True,
    ) -> None:
        self.spark = spark
        self.catalog = catalog
        self.config = config or DedupConfig()
        self.with_substr = with_substr
        self.ph = self.config.params_hash()

    # -- stage runner -----------------------------------------------------
    def _stage(self, name: str, build, mode: str = "overwrite") -> StageResult:
        if self.catalog.is_complete(name, self.ph):
            info = self.catalog.commit_info(name)
            return StageResult(name, skipped=True, rows=info.rows, wall_ms=0)
        t0 = time.time()
        df = build()
        info = self.catalog.write(df, name, self.ph, mode=mode)
        self._release_persisted()
        return StageResult(name, skipped=False, rows=info.rows, wall_ms=int((time.time() - t0) * 1000))

    def _incremental_stage(self, name: str, build) -> StageResult:
        """Append-mode stage: frontier-driven, reuses partial output
        from a killed run when params match (wiped otherwise). Routed
        through its own runner so external instrumentation can wrap
        stage boundaries uniformly with _stage."""
        if self.catalog.is_complete(name, self.ph):
            info = self.catalog.commit_info(name)
            return StageResult(name, skipped=True, rows=info.rows, wall_ms=0)
        t0 = time.time()
        self.catalog.incremental_begin(name, self.ph)
        df = build()
        info = self.catalog.write(df, name, self.ph, mode="append")
        self._release_persisted()
        return StageResult(name, False, info.rows, int((time.time() - t0) * 1000))

    def _read(self, name: str) -> DataFrame:
        return self.catalog.read(self.spark, name)

    # -- stages -----------------------------------------------------------
    def _release_persisted(self) -> None:
        """Unpersist every cached/localCheckpointed block after a stage
        commit. Operators (candidate_pairs, caches) pin intermediate
        RDDs for plan reuse within a stage; left pinned across stages
        they accumulate until the storage pool pressures execution
        memory — measured 3x slowdown on late stages at 200k docs."""
        try:
            jsc = self.spark.sparkContext._jsc
            for e in jsc.getPersistentRDDs().entrySet().toArray():
                e.getValue().unpersist(False)
        except Exception:
            pass

    def run(self, docs: DataFrame) -> PipelineReport:
        c = self.config
        t_start = time.time()
        report = PipelineReport(run_id=self.catalog.run_id)

        # stage 0: materialize the validated projection once — it feeds
        # six consumers (exact sigs, minhash frontier, verify text-attach
        # x2, anchors, substring attach x2). A committed table (not a
        # cache) is the 100 TB-correct form: column-pruned, resumable,
        # and no executor storage memory held across stages.
        cols = ["url", "text"] + [c_ for c_ in ("lang",) if c_ in docs.columns]
        report.stages.append(
            self._stage(
                "valid_docs",
                lambda: exact.valid_documents(docs, c.min_text_chars, c.langs).select(*cols),
            )
        )
        valid = self._read("valid_docs")

        report.stages.append(
            self._stage("exact_sigs", lambda: exact.with_signature(valid))
        )
        report.stages.append(
            self._stage("exact_edges", lambda: exact.exact_edges(self._read("exact_sigs")))
        )

        # minhash: incremental append against own completed output — the
        # Spark analog of the reference's `hash IS NULL` work queue.
        # Partial output from a killed run is only reused when it was
        # computed under the same params (sidecar check), otherwise wiped.
        def build_minhash() -> DataFrame:
            frontier = valid.select("url", "text")
            if self.catalog.exists("minhash_sigs"):
                done = self._read("minhash_sigs").select("url")
                frontier = frontier.join(done, "url", "left_anti")
            return minhash_signatures(frontier, c.shingle_size, c.num_perm, c.minhash_seed)

        report.stages.append(self._incremental_stage("minhash_sigs", build_minhash))

        report.stages.append(
            self._stage(
                "candidates",
                lambda: candidate_pairs(
                    band_table(self._read("minhash_sigs"), c.lsh_bands, c.lsh_rows),
                    c.band_pair_cap,
                    c.band_salt,
                    collision_broadcast=c.lsh_collision_broadcast,
                ),
            )
        )
        report.stages.append(
            self._stage(
                "verified_pairs",
                lambda: verify_pairs(
                    self._read("candidates"),
                    valid,
                    c.shingle_size,
                    c.verify_threshold,
                    sigs=self._read("minhash_sigs"),
                    num_perm=c.num_perm,
                ),
            )
        )

        if self.with_substr:
            def build_substr() -> DataFrame:
                # whole-doc dup pairs (exact-identical sha, or LSH-verified
                # near-dups) are already clustered — prune them BEFORE the
                # expensive LCS verification
                return substr_pairs(
                    valid,
                    c.substr_min_len,
                    c.substr_anchor_k,
                    c.substr_anchor_mod,
                    c.band_pair_cap,
                    c.band_salt,
                    exclude_pairs=self._read("verified_pairs").filter("is_dup"),
                    sigs=self._read("exact_sigs"),
                    collision_broadcast=c.lsh_collision_broadcast,
                )

            report.stages.append(self._stage("substr_pairs", build_substr))

        def build_clusters() -> DataFrame:
            near_edges = (
                self._read("verified_pairs")
                .filter("is_dup")
                .select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
            )
            # exact-hash edges are never dropped (recall requirement)
            all_edges = near_edges.unionByName(self._read("exact_edges"))
            assignments = connected_components(all_edges, c.cc_max_iters)
            return assign_all(valid, assignments)

        report.stages.append(self._stage("clusters", build_clusters))

        def build_report() -> DataFrame:
            clusters = self._read("clusters")
            sizes = (
                clusters.groupBy("cluster_id")
                .agg(F.count("*").alias("n_members"))
                .filter(F.col("n_members") > 1)
            )
            # membership arrays capped BEFORE aggregation (row_number, not
            # post-hoc slice): a viral-boilerplate cluster at 10^12-doc
            # scale would otherwise build one multi-GB row. Full
            # membership stays queryable in the clusters table.
            from pyspark.sql import Window

            w = Window.partitionBy("cluster_id").orderBy("url")
            capped = clusters.withColumn("__rn", F.row_number().over(w)).filter(
                F.col("__rn") <= 1000
            )
            return (
                capped.join(sizes, "cluster_id")
                .groupBy("cluster_id", "n_members")
                .agg(F.sort_array(F.collect_list("url")).alias("urls"))
            )

        report.stages.append(self._stage("dup_report", build_report))

        # input size from the valid_docs commit marker (parquet-footer
        # lineage) — no extra scan job over the raw input. docs_in
        # therefore means VALID documents (post blank-row filter), the
        # population every downstream stage and the recall denominator
        # actually operate on; raw-input row count stays with the caller.
        report.docs_in = self.catalog.table_rows("valid_docs")
        report.wall_sec = time.time() - t_start
        return report

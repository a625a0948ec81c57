"""Physical-plan assertions: the optimizations SCALE.md claims must
actually appear in the plans (pushdown, pruning, broadcast, partial
aggregation, codegen). Guards against regressions that silently turn
a broadcast join into a shuffle or widen a scan to the fat column."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_go_spark.operators import exact


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    ) if False else df._jdf.queryExecution().explainString("formatted")


def plan_str(df) -> str:
    try:
        return df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    except Exception:
        # fallback: simple string
        return df._jdf.queryExecution().toString()


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    p = plan_str(q)
    assert "PushedFilters" in p and "lang" in p.split("PushedFilters")[1][:200]
    # fat column must not be read
    read_schema = p.split("ReadSchema")[1][:300]
    assert "text" not in read_schema
    assert "doc_id" in read_schema and "n_chars" in read_schema


def test_dup_members_broadcasts_dup_keys(spark):
    sigs = spark.createDataFrame(
        [(f"u{i}", f"h{i % 3}", 10) for i in range(50)],
        "url string, content_sha string, size long",
    )
    plan = plan_str(exact.dup_members(sigs, exact.dup_groups(sigs)))
    assert "BroadcastHashJoin" in plan


def test_partial_aggregation_present(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    p = plan_str(q)
    # two-phase hash aggregate (map-side partial + final)
    assert p.count("HashAggregate") >= 2
    assert "partial_sum" in p


def test_whole_stage_codegen_on_native_path(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = exact.with_signature(docs.withColumnRenamed("doc_id", "url").withColumn("url", F.col("url").cast("string")).select("url", "text"))
    p = plan_str(q)
    # formatted mode marks whole-stage-codegen spans as "[codegen id : N]"
    assert "codegen id" in p


def test_top_groups_is_take_ordered(spark):
    sigs = spark.createDataFrame(
        [(f"u{i}", f"h{i % 5}", 10) for i in range(50)],
        "url string, content_sha string, size long",
    )
    q = exact.top_groups(exact.dup_groups(sigs), limit=3)
    p = plan_str(q)
    assert "TakeOrderedAndProject" in p


def test_anti_join_stays_join_not_subquery_loop(spark, sf_dir):
    from deduplicator_go_spark.operators.joins import existence_antijoin

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed("o_custkey", "c_custkey")
    p = plan_str(existence_antijoin(c, o, "c_custkey"))
    assert "LeftAnti" in p


def test_embedding_bands_shuffle_without_vectors(spark):
    """Round-2 defect class: the hyperplane band table used to carry
    the full vector through the band explode, shuffling every vector
    n_bands× per join side. The band table must be payload-free and the
    pair-generation plan must not reference the embedding column —
    vectors attach by id only after pair dedup."""
    import numpy as np

    from deduplicator_go_spark.operators.lsh import grid_all_pairs
    from deduplicator_go_spark.operators.similarity import hyperplane_band_table

    rng = np.random.default_rng(2)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(32)],
        "vec_id long, embedding array<double>",
    )
    bands = hyperplane_band_table(emb)
    assert set(bands.columns) == {"id", "band_id", "band_val"}
    # materialize=True pins the cell table; everything above the pin —
    # the self-join that actually shuffles — must not touch the vector
    # column (the scan below the pin legitimately reads it once for the
    # signature UDF)
    pairs = grid_all_pairs(bands, ["band_id", "band_val"], "id", materialize=True)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "embedding" not in plan
    assert set(pairs.columns) == {"id_a", "id_b"}


def test_verify_estimate_materialized_once(spark):
    """The tiered verifier's clear/borderline branches must consume a
    pinned estimate table: if the localCheckpoint is dropped, the two
    full-signature joins (and the zip_with estimate) re-enter the final
    union plan once per branch — the re-derivation class of defect that
    doubled the stage cost (BENCH/EVIDENCE.md round 2)."""
    from pyspark.sql import functions as F

    from deduplicator_go_spark.operators.minhash import minhash_signatures
    from deduplicator_go_spark.operators.verify import verify_pairs

    docs = spark.createDataFrame(
        [(f"u{i}", f"some shared text body number {i % 3} padding words")
         for i in range(12)],
        "url string, text string",
    )
    sigs = minhash_signatures(docs, 5, 32, 42)
    pairs = spark.createDataFrame(
        [("u0", "u3", "pair"), ("u1", "u4", "pair"), ("u2", "u5", "pair")],
        "url_a string, url_b string, origin string",
    )
    out = verify_pairs(pairs, docs, 5, 0.8, sigs=sigs)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the estimate (zip_with over sig arrays) was computed before the
    # checkpoint; it must not appear in the consuming plan at all
    assert "zip_with" not in plan, plan[:2000]


def test_anchor_udf_evaluates_once_above_exchange(spark):
    """The anchor stage's winnowing UDF must appear EXACTLY ONCE in the
    physical plan, above the repartition Exchange. With a plain
    explode, Catalyst's InferFiltersFromGenerate derives
    `size(anchors(text)) > 0` and pushes it below the exchange — the
    UDF then evaluates twice, the first time at scan-partition
    parallelism (2 tasks on a tick frontier: the whole winnowing pass
    ran serialized, round-5 plan audit)."""
    from deduplicator_go_spark.operators.suffix import anchor_table

    docs = spark.createDataFrame(
        [(f"u{i}", "x" * 600) for i in range(8)], "url string, text string"
    )
    out = anchor_table(docs, k=64, mod=16)
    plan = plan_str(out)
    import re

    # formatted plans name each node once in the tree and once in the
    # detail section — count detail entries "(N) ArrowEvalPython"
    udf_ids = [int(m.group(1))
               for m in re.finditer(r"\((\d+)\) ArrowEvalPython", plan)]
    exch_ids = [int(m.group(1))
                for m in re.finditer(r"\((\d+)\) Exchange", plan)]
    assert len(udf_ids) == 1, plan[:3000]
    # and it sits above the exchange (formatted plans number leaves
    # first, so above == larger node id)
    assert exch_ids and udf_ids[0] > max(exch_ids), plan[:3000]


def test_benchmark_overlap_broadcasts_bench_grams(spark, sf_dir):
    """The decontamination join must broadcast the BENCHMARK gram set
    (fixed-size eval suite); the train side must never shuffle by gram."""
    from deduplicator_go_spark.operators.corpus import benchmark_overlap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 20 == 7)
    train = docs.filter(F.col("doc_id") % 20 != 7)
    p = plan_str(benchmark_overlap(train, bench, n=5))
    assert "BroadcastHashJoin" in p


def test_pii_redaction_is_shuffle_free(spark, sf_dir):
    """PII tagging/scrubbing is pure map-stage column algebra — zero
    exchanges, single codegen stage."""
    from deduplicator_go_spark.functions import pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    c = pii.pii_counts(F.col("text"))
    q = docs.select(
        "doc_id", c["n_emails"].alias("e"),
        pii.redact_pii(F.col("text")).alias("r"),
    )
    p = plan_str(q)
    assert "Exchange" not in p
    assert "codegen id" in p


def test_token_budget_single_exchange_no_global_sort(spark, sf_dir):
    """Budget sampling shuffles once (by source, for the window) and
    never global-sorts the corpus."""
    from deduplicator_go_spark.operators.corpus import token_budget_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import re

    p = plan_str(token_budget_sample(docs, budget_tokens=1000))
    # one hash-partitioned exchange for the window; no range exchange
    # (a global sort would show rangepartitioning)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "hashpartitioning(source" in p
    assert "rangepartitioning" not in p


def test_duplicated_chunks_partial_aggregation(spark, sf_dir):
    """Chunk counting must partial-aggregate map-side so a viral chunk
    is one grouped key, never a pair explosion."""
    from deduplicator_go_spark.operators.corpus import duplicated_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_str(duplicated_chunks(docs))
    assert p.count("HashAggregate") >= 2
    assert "partial_count" in p

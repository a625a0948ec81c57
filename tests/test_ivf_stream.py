"""IVF ANN + streaming dedup + empty-input pipeline edge."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplicator_go_spark.operators import ivf, similarity


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    # two well-separated blobs so IVF cells are meaningful
    a = rng.standard_normal((30, 12)) + 4.0
    b = rng.standard_normal((30, 12)) - 4.0
    mat = np.vstack([a, b]).astype(np.float32)
    mat[1] = mat[0] + 0.01 * rng.standard_normal(12).astype(np.float32)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(60)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_centroids_deterministic(emb):
    c1 = ivf.train_centroids(emb, n_cells=4, seed=7)
    c2 = ivf.train_centroids(emb, n_cells=4, seed=7)
    assert np.allclose(c1, c2)


def test_ivf_topk_matches_exact_nn(emb):
    exact_nn = {r["id_a"]: r["id_b"] for r in similarity.brute_force_topk(emb, k=1).collect()}
    approx = {r["id_a"]: r["id_b"] for r in
              ivf.ivf_topk(emb, k=1, n_cells=4, n_probe=2).collect()}
    # near-dup pair must be found; overall hit rate high with 2 probes
    assert approx[0] == exact_nn[0]
    hits = sum(1 for k in exact_nn if approx.get(k) == exact_nn[k])
    assert hits / len(exact_nn) >= 0.9


def test_ivf_hot_cell_salting_preserves_results(spark):
    """A deliberately clustered corpus (every vector in one tight blob →
    one hot cell) must give identical output with a tiny cell_cap
    (heavy salting) and with an effectively-unbounded cap: the salt
    changes task shape, never candidate membership."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(12)
    mat = (base + 0.05 * rng.standard_normal((80, 12))).astype(np.float32)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    kw = dict(k=3, n_cells=4, n_probe=2, seed=9)
    salted = ivf.ivf_topk(emb, cell_cap=8, **kw).collect()
    plain = ivf.ivf_topk(emb, cell_cap=1 << 30, **kw).collect()
    key = lambda r: (r["id_a"], r["rank"])
    assert sorted(((r["id_a"], r["id_b"], r["cos"], r["rank"]) for r in salted)) == \
           sorted(((r["id_a"], r["id_b"], r["cos"], r["rank"]) for r in plain))


def test_stream_dedup(spark, tmp_path):
    import shutil

    from deduplicator_go_spark.streaming import events_stream

    src = tmp_path / "stream"
    src.mkdir()
    df = spark.createDataFrame(
        [(1, "2025-01-01 00:00:00", 10, "click", 1.0, "{}"),
         (2, "2025-01-01 00:00:05", 10, "click", 1.0, "{}"),   # dup key within watermark
         (3, "2025-01-01 00:10:00", 11, "view", 2.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(str(src / "p"))
    stream = events_stream.read_events_stream(spark, str(src / "p"))
    deduped = events_stream.stream_dedup(stream, ["user_id", "event_type"])
    q = (deduped.writeStream.outputMode("append").format("memory")
         .queryName("t_dedup_out").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT user_id, event_type FROM t_dedup_out").collect()
    assert sorted((r["user_id"], r["event_type"]) for r in got) == [(10, "click"), (11, "view")]


def test_pipeline_empty_input(spark, tmp_path):
    from deduplicator_go_spark.config import DedupConfig
    from deduplicator_go_spark.plans.pipeline import DedupPipeline
    from deduplicator_go_spark.sources.catalog import CheckpointCatalog

    empty = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    pipe = DedupPipeline(spark, CheckpointCatalog(str(tmp_path / "c")), DedupConfig(),
                         with_substr=True)
    report = pipe.run(empty)
    assert report.docs_in == 0
    clusters = pipe.catalog.read(spark, "clusters")
    assert clusters.count() == 0

"""SimHash, n-gram Jaccard, embedding similarity, catalog joins,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplicator_go_spark.operators import joins, multimodal, ngram, similarity, simhash


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------

def test_simhash_identical_and_near(spark):
    base = " ".join(f"tok{i}" for i in range(200))
    near = base.replace("tok5 ", "tok5x ").replace("tok100 ", "zzz ")
    far = " ".join(f"other{i}" for i in range(200))
    df = spark.createDataFrame(
        [("a", base), ("b", base), ("c", near), ("d", far)], "url string, text string"
    )
    sigs = {r["url"]: r["simhash"] for r in simhash.simhash(df).collect()}
    assert sigs["a"] == sigs["b"]
    ham_near = bin((sigs["a"] ^ sigs["c"]) & ((1 << 64) - 1)).count("1")
    ham_far = bin((sigs["a"] ^ sigs["d"]) & ((1 << 64) - 1)).count("1")
    assert ham_near < 12 < ham_far


def test_simhash_candidates_pigeonhole(spark):
    base = " ".join(f"tok{i}" for i in range(300))
    near = base.replace("tok7 ", "q7 ")
    df = spark.createDataFrame([("a", base), ("b", near)], "url string, text string")
    cands = simhash.simhash_candidates(simhash.simhash(df), max_hamming=3).collect()
    assert [(r["url_a"], r["url_b"]) for r in cands] == [("a", "b")]


# --------------------------------------------------------------------------
# word n-gram jaccard
# --------------------------------------------------------------------------

def test_word_ngrams(spark):
    df = spark.createDataFrame([("d1", "a b c d")], "url string, text string")
    grams = sorted(r["gram"] for r in ngram.word_ngrams(df, 3).collect())
    assert grams == ["a b c", "b c d"]


def test_ngram_jaccard_pairs(spark):
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "the quick brown fox jumps over the lazy dog again and then"
    t3 = "completely different words entirely here nothing shared at all"
    df = spark.createDataFrame(
        [("d1", t1), ("d2", t2), ("d3", t3)], "url string, text string"
    )
    got = ngram.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [("d1", "d2")]
    r = got[0]
    # 12 tokens -> 10 trigrams each; common = 9 (last two differ)
    assert r["na"] == 10 and r["nb"] == 10 and r["n_common"] == 9
    assert abs(r["jaccard"] - 9 / 11) < 1e-6


def test_ngram_viral_gram_capped(spark):
    """A viral trigram shared by every doc must not explode into O(n^2)
    join rows: with max_doc_freq below the corpus size it is dropped
    from the gram universe, so unrelated docs produce zero pairs while
    true dups (sharing rare grams too) still pair."""
    viral = "click here now"
    rows = [(f"d{i:03d}", f"{viral} unique{i} words{i} here{i} tail{i}") for i in range(50)]
    # one true dup pair sharing all their rare grams
    rows.append(("dup_a", f"{viral} same rare content shared fully end"))
    rows.append(("dup_b", f"{viral} same rare content shared fully end"))
    df = spark.createDataFrame(rows, "url string, text string")
    got = ngram.ngram_jaccard_pairs(df, n=3, threshold=0.5, max_doc_freq=10).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [("dup_a", "dup_b")]
    # and the intersection count itself is bounded: no pair row carries
    # the viral gram (na excludes it)
    assert got[0]["na"] < 10  # far fewer grams than raw trigram count

    # uncapped, the same corpus pairs every doc with every doc via the
    # viral gram at the join level (the skew the cap prevents); sanity:
    # capped plan's pre-threshold pair count is exactly 1
    grams = ngram.word_ngrams(df, 3)
    from pyspark.sql import functions as F
    hot_df = grams.groupBy("gram").agg(F.count("*").alias("df")).filter("df > 10")
    assert hot_df.count() == 1  # only the viral trigram is dropped


# --------------------------------------------------------------------------
# embedding similarity
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    # vec 0 and 1 nearly identical; 2 is its slight rotation
    base[1] = base[0] + 0.01 * rng.standard_normal(16).astype(np.float32)
    base[2] = base[0] + 0.05 * rng.standard_normal(16).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(emb):
    top = similarity.brute_force_topk(emb, k=2).collect()
    by_a = {}
    for r in top:
        by_a.setdefault(r["id_a"], []).append((r["rank"], r["id_b"], r["cos"]))
    assert sorted(x[1] for x in by_a[0]) == [1, 2]
    assert all(len(v) == 2 for v in by_a.values())


def test_brute_force_fenced_to_bounded_inputs(emb):
    with pytest.raises(ValueError, match="lsh_topk or ivf_topk"):
        similarity.brute_force_topk(emb, k=2, max_rows=10)


def test_brute_force_string_ids(spark, emb):
    """id_b schema must follow the inferred id type (regression: it was
    hardcoded long, breaking string-id inputs at Arrow conversion)."""
    s = emb.selectExpr("concat('v', vec_id) AS vec_id", "embedding")
    top = similarity.brute_force_topk(s, k=1).collect()
    assert all(isinstance(r["id_a"], str) and isinstance(r["id_b"], str) for r in top)


def test_lsh_topk_agrees_on_near_duplicates(emb):
    exact_rows = similarity.brute_force_topk(emb, k=1).collect()
    exact_nn = {r["id_a"]: r["id_b"] for r in exact_rows}
    approx_rows = similarity.lsh_topk(emb, k=1, n_bits=16, n_bands=8).collect()
    approx_nn = {r["id_a"]: r["id_b"] for r in approx_rows}
    # the true near-dup trio must be found by the approximate path
    assert approx_nn.get(0) == exact_nn[0]
    assert approx_nn.get(1) == exact_nn[1]


def test_embedding_dup_pairs(emb):
    pairs = {(r["id_a"], r["id_b"]) for r in
             similarity.embedding_dup_pairs(emb, threshold=0.99).collect()}
    assert (0, 1) in pairs
    assert all(a < b for a, b in pairs)


def test_grid_all_pairs_exact_and_bounded(spark):
    """The theta-join grid must (1) produce EXACTLY the all-pairs set —
    nothing lost, nothing duplicated — even when a bucket is far over
    the cell cap, and (2) bound every grid cell to ~2·cell_cap members
    so no single task owns a quadratic hot bucket."""
    from deduplicator_go_spark.operators.lsh import grid_all_pairs, grid_cells

    n, cap = 300, 16
    rows = [(0, i) for i in range(n)] + [(1, 900), (1, 901)]  # hot + small bucket
    band = spark.createDataFrame(rows, "band_val int, id long").withColumn(
        "band_id", F.lit(0)
    )
    pairs = grid_all_pairs(band, ["band_id", "band_val"], "id", cell_cap=cap).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {(a, b) for a in range(n) for b in range(n) if a < b} | {(900, 901)}
    assert got == want  # exact, no dup rows (collect len == set len)
    assert len(pairs) == len(want)

    cells = grid_cells(band, ["band_id", "band_val"], "id", cell_cap=cap)
    per_cell = (
        cells.groupBy("band_id", "band_val", "ci", "cj").count().collect()
    )
    # each cell holds members of <= 2 hash groups of ~n/g each; allow
    # hash-imbalance slack (4x cap) but nothing near the raw bucket size
    assert max(r["count"] for r in per_cell) <= 4 * cap


def test_wide_band_config_never_collapses(spark):
    """Round-3 weak component: the headline adaptive policy (n_bands=10
    × auto_band_width) exceeded the old single-int64 signature packing
    for any corpus over 2,048 vectors — every band above bit 63 read 0
    for ALL rows, i.e. one corpus-wide bucket per high band and
    quadratic candidate work the recall gate structurally cannot see.
    With per-band packing, at n=4,096 (width 7 × 10 bands = 70 bits —
    past the old cliff) every band must spread into many distinct
    values and no bucket may approach corpus size."""
    from deduplicator_go_spark.operators.similarity import (
        auto_band_width,
        hyperplane_band_table,
    )

    n, n_bands = 4096, 10
    width = auto_band_width(n)
    assert n_bands * width > 64  # the config the old packing truncated
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.pmod(F.xxhash64("id", F.lit(j)), F.lit(2001)) / 1000.0 - 1.0)
                for j in range(16)
            ]
        ).cast("array<double>").alias("embedding"),
    )
    bands = hyperplane_band_table(emb, n_bits=n_bands * width, n_bands=n_bands)
    stats = (
        bands.groupBy("band_id")
        .agg(
            F.countDistinct("band_val").alias("nv"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(stats) == n_bands
    for r in stats:
        assert r["n"] == n
        assert r["nv"] > 2, f"band {r['band_id']} collapsed to {r['nv']} values"
    biggest = (
        bands.groupBy("band_id", "band_val").count().agg(F.max("count")).first()[0]
    )
    # expected bucket ≈ n / 2^width = 32; hash imbalance slack, but a
    # collapsed band would put all 4096 rows in one bucket
    assert biggest <= 16 * (n >> width)


def test_band_values_match_legacy_extraction(spark):
    """For n_bits <= 63 (where the old single-long packing was legal),
    per-band packing must produce bit-identical band values to the
    legacy shift-and-mask extraction over hyperplane_signatures — the
    representation changed, the banding semantics did not."""
    from deduplicator_go_spark.operators.similarity import (
        hyperplane_band_table,
        hyperplane_signatures,
    )

    rng = np.random.default_rng(7)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(12)]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    n_bits, n_bands = 48, 6
    width = n_bits // n_bands
    got = {
        (r["id"], r["band_id"]): r["band_val"]
        for r in hyperplane_band_table(emb, n_bits, n_bands).collect()
    }
    sigs = {r["id"]: r["hsig"] for r in hyperplane_signatures(emb, n_bits).collect()}
    for (vid, b), val in got.items():
        assert val == (sigs[vid] >> (b * width)) & ((1 << width) - 1)

    with pytest.raises(ValueError, match="single int64"):
        hyperplane_signatures(emb, n_bits=70)


def test_lsh_topk_broadcast_optout_and_n_rows(emb):
    """broadcast_sizes=False (shuffle-degraded collision-size join for
    corpora whose collision table outgrows the driver) and an explicit
    n_rows (catalog metadata instead of a count() scan) must produce
    results identical to the defaults."""
    base = similarity.lsh_topk(emb, k=1, n_bits=16, n_bands=8).collect()
    no_bc = similarity.lsh_topk(
        emb, k=1, n_bits=16, n_bands=8, broadcast_sizes=False
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, no_bc))
    meta = similarity.lsh_topk(emb, k=1, n_bits=None, n_bands=8, n_rows=20).collect()
    auto = similarity.lsh_topk(emb, k=1, n_bits=None, n_bands=8).collect()
    assert sorted(map(tuple, meta)) == sorted(map(tuple, auto))


def test_embedding_lsh_hot_bucket_bounded(spark):
    """A deliberately clustered embedding corpus (every vector in one
    hyperplane bucket): embedding_dup_pairs must go through the salted
    chain — edges near-linear in the cluster size, never all-pairs —
    and lsh_topk must keep exact within-bucket coverage through the
    grid while never building an unbounded per-task pair list."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal(16).astype(np.float64)
    rows = [
        (i, [float(x) for x in (base + 1e-4 * rng.standard_normal(16))])
        for i in range(240)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    dups = similarity.embedding_dup_pairs(
        emb, threshold=0.9, band_pair_cap=16, band_salt=4
    )
    n_edges = dups.count()
    # all 240 vectors share every band bucket: all-pairs would be 28680
    assert 239 <= n_edges < 6 * 240
    # connectivity: the threshold-passing edge set must form ONE cluster
    from deduplicator_go_spark.operators.components import connected_components

    edges = dups.select(
        F.col("id_a").cast("string").alias("src"),
        F.col("id_b").cast("string").alias("dst"),
    )
    labels = connected_components(edges)
    assert labels.select("cluster_id").distinct().count() == 1

    # grid path: top-1 of every member is exact within the bucket
    top = similarity.lsh_topk(emb, k=1, cell_cap=16)
    assert top.count() == 240


# --------------------------------------------------------------------------
# catalog joins
# --------------------------------------------------------------------------

def test_existence_antijoin(spark):
    new = spark.createDataFrame([("h1",), ("h2",), ("h3",)], "h string")
    old = spark.createDataFrame([("h2",)], "h string")
    got = sorted(r["h"] for r in joins.existence_antijoin(new, old, "h").collect())
    assert got == ["h1", "h3"]


def test_mirror_missing_and_conflicts(spark):
    cat = spark.createDataFrame(
        [("hostA", "p1", "x"), ("hostB", "p1", "x"),
         ("hostA", "p2", "y"), ("hostB", "p3", "z"), ("hostC", "p3", "w")],
        "host string, relpath string, hash string",
    )
    hosts = spark.createDataFrame([("hostA",), ("hostB",), ("hostC",)], "host string")
    missing = {r["relpath"]: r["missing_hosts"] for r in
               joins.mirror_missing(cat, "host", "relpath", hosts).collect()}
    assert missing["p1"] == ["hostC"]
    assert missing["p2"] == ["hostB", "hostC"]
    assert missing["p3"] == ["hostA"]
    conflicts = [r["relpath"] for r in
                 joins.mirror_conflicts(cat, "relpath", "hash").collect()]
    assert conflicts == ["p3"]


def test_hash_size_conflicts(spark):
    cat = spark.createDataFrame(
        [("h1", 10), ("h1", 10), ("h2", 5), ("h2", 6)], "hash string, size long"
    )
    got = [r["hash"] for r in joins.hash_size_conflicts(cat, "hash", "size").collect()]
    assert got == ["h2"]


def test_change_detection(spark):
    incoming = spark.createDataFrame(
        [("k1", "h1", 10), ("k2", "h2x", 20), ("k3", "h3", 30)],
        "key string, hash string, size long",
    )
    stored = spark.createDataFrame(
        [("k1", "h1", 10), ("k2", "h2", 20)], "key string, hash string, size long"
    )
    got = {r["key"]: r["change"] for r in
           joins.change_detection(incoming, stored, ["key"], ["hash", "size"]).collect()}
    assert got == {"k1": "unchanged", "k2": "update", "k3": "insert"}


def test_prune_and_keep_most_specific(spark):
    cat = spark.createDataFrame(
        [(1, "/a/b", "/a"), (2, "/a/b", "/a/longer"), (3, "/c", "/c")],
        "id long, resolved string, root string",
    )
    listing = spark.createDataFrame([("/a/b",)], "resolved string")
    pruned = [r["id"] for r in joins.prune_missing(cat, listing, "resolved").collect()]
    assert pruned == [3]
    kept = sorted(r["id"] for r in
                  joins.keep_most_specific(cat, "resolved", "root", "id").collect())
    assert kept == [2, 3]


# --------------------------------------------------------------------------
# multimodal plumbing
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", b"\x89PNGfakebytes1", "image/png", 64, 64, None),
        ("m2", "image", b"\x89PNGfakebytes1", "image/png", 64, 64, None),
        ("m3", "audio", b"RIFFfakewav", "audio/wav", None, None, 1200),
        ("m4", "video", b"\x00\x00ftypmp4x", "video/mp4", 320, 240, 5000),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_media_feature_plumbing(media):
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 4
    by_id = {r["media_id"]: r for r in feats}
    assert by_id["m1"]["feature"] == by_id["m2"]["feature"]  # deterministic
    assert by_id["m1"]["payload_sha"] == by_id["m2"]["payload_sha"]
    assert len(by_id["m3"]["feature"]) == 8
    assert by_id["m4"]["n_bytes"] == len(b"\x00\x00ftypmp4x")


def test_media_strict_raises(media):
    """strict=True raises for undecodable mimes — now at action time,
    inside the UDF, since BMP/WAV decode for real."""
    with pytest.raises(Exception, match="codec libraries"):
        multimodal.extract_features(media, strict=True).collect()


def test_bmp_wav_roundtrip_bit_exact():
    """Pure-numpy codecs: encode → decode must be bit-exact (pixels and
    samples), including BMP row padding for non-multiple-of-4 widths."""
    rng = np.random.default_rng(3)
    for w, h in ((32, 32), (13, 7), (1, 1)):
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        assert np.array_equal(multimodal.decode_bmp(multimodal.encode_bmp(img)), img)
    samples = rng.integers(-32768, 32768, 4096).astype(np.int16)
    got, rate = multimodal.decode_wav(multimodal.encode_wav(samples, rate=8000))
    assert rate == 8000 and np.array_equal(got, samples)


def test_perceptual_hash_noise_invariant_and_distinct():
    """The avg-hash/envelope-hash must survive the fixture's planted
    noise (same hash) while distinct contents hash apart."""
    from deduplicator_go_spark.fixtures import media as fx

    for cid in (0, 2, 8):
        base = multimodal.image_average_hash(multimodal.decode_bmp(fx.synth_image(cid)))
        noisy = multimodal.image_average_hash(
            multimodal.decode_bmp(fx.synth_image(cid, noise_seed=cid + 4))
        )
        assert base == noisy
    assert multimodal.image_average_hash(
        multimodal.decode_bmp(fx.synth_image(0))
    ) != multimodal.image_average_hash(multimodal.decode_bmp(fx.synth_image(2)))
    a0 = multimodal.audio_envelope_hash(multimodal.decode_wav(fx.synth_audio(1))[0])
    a0n = multimodal.audio_envelope_hash(
        multimodal.decode_wav(fx.synth_audio(1, noise_seed=5))[0]
    )
    a1 = multimodal.audio_envelope_hash(multimodal.decode_wav(fx.synth_audio(3))[0])
    assert a0 == a0n and a0 != a1


def test_media_phash_dedup_finds_planted_pairs(spark):
    """End-to-end multimodal dedup on the synthetic corpus: decoded
    perceptual hashes + banded Hamming candidates return EXACTLY the
    planted near-dup truth set, kind-scoped."""
    from deduplicator_go_spark.fixtures import media as fx

    ids = spark.range(0, 80).withColumnRenamed("id", "doc_id")
    corpus = fx.synthetic_media(ids, "doc_id")
    pairs = multimodal.phash_dup_pairs(corpus, max_hamming=3).collect()
    got = {(r["media_id_a"], r["media_id_b"]) for r in pairs}
    assert got == fx.truth_pairs(list(range(80)))
    assert all(r["hamming"] == 0 for r in pairs)
    kinds = {r["kind"] for r in pairs}
    assert kinds == {"image", "audio"}


def test_perceptual_hash_strict_raises_on_unsupported(media):
    # whichever partition errors first: the unsupported-mime raise or
    # a malformed-payload ValueError (the fixture has fake PNG, fake
    # WAV, and an unsupported-mime row — task scheduling picks the
    # winner)
    with pytest.raises(Exception, match="codec libraries|not a WAV|not a PNG"):
        multimodal.perceptual_hashes(media, strict=True).collect()
    # non-strict: undecodable rows come back with NULL phash
    rows = multimodal.perceptual_hashes(media, strict=False).collect()
    assert all(r["phash"] is None for r in rows)  # fixture payloads are fakes


def test_phash_nonstrict_survives_unsupported_bmp_variant(spark):
    """Round-3 advisor finding: a payload declared image/bmp whose
    header says bpp != 24 raises NotImplementedError from decode_bmp,
    which the non-strict except tuple used to miss — one such row
    crashed the whole UDF despite the 'emit NULL and filter' contract.
    The dup job must also survive it end-to-end (phash_dup_pairs
    defaults to strict=False and filters NULL hashes)."""
    import struct

    from deduplicator_go_spark.fixtures import media as fx

    ids = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    corpus = fx.synthetic_media(ids, "doc_id")
    # well-formed BMP header claiming 32 bpp -> NotImplementedError path
    bad = struct.pack("<2sIHHI", b"BM", 70, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 32, 0, 16, 2835, 2835, 0, 0
    ) + b"\x00" * 16
    # well-formed PNG wrapper around a CORRUPT deflate stream: zlib
    # raises zlib.error from decompress, which the round-4 advisor
    # found the non-strict except tuples missed — one malformed IDAT
    # crashed the whole corpus job despite the NULL-on-undecodable
    # contract
    good_png = multimodal.encode_png(
        (np.arange(48, dtype=np.uint8)).reshape(4, 4, 3)
    )
    pos = good_png.index(b"IDAT") - 4
    (idat_len,) = struct.unpack_from(">I", good_png, pos)
    body_off = pos + 8
    corrupt_idat = (
        good_png[:body_off]
        + bytes(b ^ 0xFF for b in good_png[body_off : body_off + idat_len])
        + good_png[body_off + idat_len :]
    )
    bad_rows = spark.createDataFrame(
        [
            ("bad1", "image", "image/bmp", bytearray(bad)),
            ("bad2", "image", "image/png", bytearray(corrupt_idat)),
        ],
        "media_id string, kind string, mime string, payload binary",
    )
    view = corpus.select("media_id", "kind", "mime", "payload").unionByName(bad_rows)

    hashes = {r["media_id"]: r["phash"]
              for r in multimodal.perceptual_hashes(view, strict=False).collect()}
    assert hashes["bad1"] is None
    assert hashes["bad2"] is None
    assert sum(v is not None for v in hashes.values()) == len(hashes) - 2
    # (spark wraps the worker-side error in PythonException; EITHER bad
    # row's error may surface first depending on task completion order —
    # the 32bpp BMP's "24-bit" NotImplementedError or the corrupt-IDAT
    # PNG's zlib "decompressing"/"header check" error are both correct
    # strict failures)
    with pytest.raises(Exception, match="24-bit|decompressing|header check"):
        multimodal.perceptual_hashes(view, strict=True).collect()

    pairs = multimodal.phash_dup_pairs(view, max_hamming=3).collect()
    got = {(r["media_id_a"], r["media_id_b"]) for r in pairs}
    assert got == fx.truth_pairs(list(range(8)))
    assert not any("bad1" in p or "bad2" in p for p in got)


def test_png_codec_roundtrip_all_filters():
    """Engine PNG codec (stdlib zlib + numpy): every filter type
    round-trips losslessly; gray and RGBA decode to (h, w, 3); 16-bit
    and interlaced streams raise instead of mis-decoding."""
    import struct
    import zlib

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 41, 3), dtype=np.uint8)
    for ft in range(5):
        back = multimodal.decode_png(multimodal.encode_png(img, filter_type=ft))
        assert (back == img).all(), f"filter {ft}"

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    def raw_png(px, color_type):
        h, w = px.shape[:2]
        raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))
        return (multimodal._PNG_SIG
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    g = rng.integers(0, 256, (9, 7), dtype=np.uint8)
    assert (multimodal.decode_png(raw_png(g, 0))
            == np.repeat(g[:, :, None], 3, axis=2)).all()
    a = rng.integers(0, 256, (5, 6, 4), dtype=np.uint8)
    assert (multimodal.decode_png(raw_png(a, 6)) == a[:, :, :3]).all()

    with pytest.raises(NotImplementedError, match="8-bit"):
        bad = multimodal.encode_png(img)
        # flip depth byte in IHDR (offset: sig 8 + len 4 + tag 4 + w 4 + h 4)
        bad = bad[:24] + b"\x10" + bad[25:]
        multimodal.decode_png(bad)


def test_cross_format_phash_and_transcode(spark):
    """The same pixels as BMP and as PNG must produce the SAME
    perceptual hash (hashes are over decoded content; both codecs
    lossless), and the distributed transcode_media + phash_dup_pairs
    path must pair every original with its transcode and nothing
    else."""
    from deduplicator_go_spark.fixtures import media as fx

    ids = spark.range(0, 48).withColumnRenamed("id", "doc_id").filter(
        (F.col("doc_id") % 8).isin(2, 6)
    )
    media = fx.synthetic_media(ids)
    png = multimodal.transcode_media(media, to_mime="image/png", id_prefix="p")
    png_rows = png.collect()
    assert len(png_rows) == 12 and all(r["mime"] == "image/png" for r in png_rows)

    both = multimodal.perceptual_hashes(media.unionByName(png), strict=True).collect()
    by_id = {r["media_id"]: r["phash"] for r in both}
    for i in list(range(48)):
        if i % 8 in (2, 6):
            assert by_id[f"m{i:08d}"] == by_id["pm" + f"{i:08d}"]

    pairs = multimodal.phash_dup_pairs(media.unionByName(png), max_hamming=3).collect()
    got = {(r["media_id_a"], r["media_id_b"]) for r in pairs}
    want = {(f"m{i:08d}", "pm" + f"{i:08d}") for i in range(48) if i % 8 in (2, 6)}
    assert got == want
    assert all(r["hamming"] == 0 for r in pairs)

    # bmp -> png -> bmp double transcode is pixel-identical too;
    # transcoded ids carry the FULL original id ("q" + "pm" + digits) —
    # digits-only stripping would collide ids differing in letters
    back = multimodal.transcode_media(png, to_mime="image/bmp", id_prefix="q")
    h_back = {r["media_id"]: r["phash"]
              for r in multimodal.perceptual_hashes(back, strict=True).collect()}
    assert h_back and all(mid.startswith("qpm") for mid in h_back)
    for mid, ph in h_back.items():
        assert ph == by_id["m" + mid[len("qpm"):]]


def test_adpcm_roundtrip_and_cross_codec_dedup(spark):
    """IMA ADPCM: encode/decode round-trips within quantization noise,
    the energy-envelope hash survives the lossy transcode exactly, and
    the distributed PCM→ADPCM transcode + phash_dup_pairs path pairs
    every original with its transcode and nothing else."""
    import numpy as np

    from deduplicator_go_spark.fixtures import media as fx

    # codec round-trip on a smooth signal: bounded quantization noise
    t = np.arange(8000)
    sig = (9000 * np.sin(2 * np.pi * t / 160)).astype(np.int16)
    enc = multimodal.encode_adpcm_wav(sig, rate=8000)
    dec, rate = multimodal.decode_wav(enc)
    assert rate == 8000 and len(dec) == len(sig)
    err = np.abs(dec.astype(np.int64) - sig.astype(np.int64))
    assert err.mean() < 100 and len(enc) < len(sig)  # lossy-small + compressed

    # corrupt/truncated ADPCM payload stays inside the non-strict
    # NULL-row contract (no uncovered exception class)
    try:
        multimodal.decode_wav(enc[:40] + b"\x00" * 8)
        raise AssertionError("corrupt ADPCM payload decoded")
    except multimodal._DECODE_ERRORS:
        pass

    ids = spark.range(0, 48).withColumnRenamed("id", "doc_id").filter(
        (F.col("doc_id") % 8).isin(3, 7)
    )
    media = fx.synthetic_media(ids)  # audio/wav PCM rows
    adp = multimodal.transcode_media(media, to_mime="audio/adpcm", id_prefix="a")
    adp_rows = adp.collect()
    assert len(adp_rows) == 12 and all(r["mime"] == "audio/adpcm" for r in adp_rows)
    # 4-bit vs 16-bit: payloads must actually be compressed
    pcm_sizes = {r["media_id"]: len(r["payload"]) for r in media.collect()}
    for r in adp_rows:
        assert len(r["payload"]) < pcm_sizes[r["media_id"][1:]] / 3

    pairs = multimodal.phash_dup_pairs(media.unionByName(adp), max_hamming=3).collect()
    got = {(r["media_id_a"], r["media_id_b"]) for r in pairs}
    want = {("a" + f"m{i:08d}", f"m{i:08d}") for i in range(48) if i % 8 in (3, 7)}
    assert got == want
    assert all(r["hamming"] == 0 and r["kind"] == "audio" for r in pairs)


def test_avi_roundtrip_and_video_dedup(spark):
    """Raw-DIB AVI: encode/decode is pixel-lossless, the frame-sampled
    video hash survives per-frame noise, and the distributed
    synthetic_video + phash_dup_pairs path pairs every clean clip with
    its noisy re-render and nothing else."""
    import numpy as np

    from deduplicator_go_spark.fixtures import media as fx

    frames = np.random.default_rng(3).integers(0, 256, (4, 20, 33, 3)).astype(np.uint8)
    enc = multimodal.encode_avi(frames, fps=8)
    dec = multimodal.decode_avi(enc)
    assert dec.shape == frames.shape and (dec == frames).all()

    # truncated payload stays inside the non-strict NULL-row contract
    try:
        multimodal.decode_avi(enc[:60])
        raise AssertionError("corrupt AVI payload decoded")
    except multimodal._DECODE_ERRORS:
        pass

    ids = spark.range(0, 48).withColumnRenamed("id", "doc_id").filter(
        (F.col("doc_id") % 8).isin(2, 6)
    )
    vids = fx.synthetic_video(ids)
    rows = vids.collect()
    assert len(rows) == 24 and all(r["mime"] == "video/avi" for r in rows)

    pairs = multimodal.phash_dup_pairs(vids, max_hamming=3).collect()
    got = {(r["media_id_a"], r["media_id_b"]) for r in pairs}
    want = {(f"v{i:08d}", f"w{i:08d}") for i in range(48) if i % 8 in (2, 6)}
    assert got == want
    assert all(r["hamming"] == 0 and r["kind"] == "video" for r in pairs)


def test_resize_media_resolution_invariant_dedup(spark):
    """Box resize: identity resize is exact, integer-factor downscale
    equals reshape-mean, and the distributed resize_media +
    phash_dup_pairs path pairs every original with its thumbnail and
    nothing else (resolution-invariant dedup)."""
    import numpy as np

    from deduplicator_go_spark.fixtures import media as fx

    img = np.random.default_rng(1).integers(0, 256, (32, 32, 3)).astype(np.uint8)
    assert (multimodal.resize_image(img, 32, 32) == img).all()
    ref = np.rint(
        img.astype(np.float64).reshape(16, 2, 16, 2, 3).mean(axis=(1, 3))
    ).astype(np.uint8)
    assert (multimodal.resize_image(img, 16, 16) == ref).all()
    assert multimodal.resize_image(img, 64, 48).shape == (48, 64, 3)

    ids = spark.range(0, 48).withColumnRenamed("id", "doc_id").filter(
        (F.col("doc_id") % 8).isin(2, 6)
    )
    media = fx.synthetic_media(ids)
    small = multimodal.resize_media(media, 16, 16, id_prefix="r")
    rows = small.collect()
    assert len(rows) == 12
    assert all(r["width"] == 16 and r["height"] == 16 for r in rows)

    pairs = multimodal.phash_dup_pairs(media.unionByName(small), max_hamming=3).collect()
    got = {(r["media_id_a"], r["media_id_b"]) for r in pairs}
    want = {(f"m{i:08d}", "rm" + f"{i:08d}") for i in range(48) if i % 8 in (2, 6)}
    assert got == want and all(r["hamming"] == 0 for r in pairs)


def test_media_stats_and_exact_dups(media):
    stats = {r["kind"]: r["n"] for r in multimodal.media_stats(media).collect()}
    assert stats == {"image": 2, "audio": 1, "video": 1}
    dups = multimodal.exact_dup_media(media).collect()
    assert sorted(r["media_id"] for r in dups) == ["m1", "m2"]


def test_relative_to_prefix_arbitrary_column(spark):
    """relative_to_prefix must work on any column name and Column
    prefixes (review regression: it hardcoded 'url' inside F.expr)."""
    from pyspark.sql import functions as F

    from deduplicator_go_spark.functions.url import relative_to_prefix

    df = spark.createDataFrame(
        [("/archive/a/b.txt",), ("/other/c.txt",)], "path string"
    )
    got = df.select(
        relative_to_prefix(F.col("path"), "/archive/").alias("rel"),
        relative_to_prefix(F.col("path"), F.lit("/other/")).alias("rel2"),
    ).collect()
    assert got[0]["rel"] == "a/b.txt" and got[0]["rel2"] is None
    assert got[1]["rel"] is None and got[1]["rel2"] == "c.txt"


def test_plan_import_count_bounds_work_not_skips(spark):
    """--count must bound work rows (transfer/duplicate); no-op
    skip_exists rows cannot pin repeated bounded runs to the same
    already-cataloged keys (review regression)."""
    from deduplicator_go_spark.operators.actions import plan_import

    incoming = spark.createDataFrame(
        [(f"a{i:02d}", 10, None) for i in range(5)]  # cataloged: sort first
        + [(f"z{i:02d}", 20, None) for i in range(3)],  # new
        "path string, size long, mod_time timestamp",
    )
    stored = spark.createDataFrame([(f"a{i:02d}",) for i in range(5)], "path string")
    plan = plan_import(incoming, stored, count=2)  # no duplicate_prefix
    rows = {r["path"]: r["action"] for r in plan.collect()}
    transfers = [p for p, a in rows.items() if a == "transfer"]
    assert sorted(transfers) == ["z00", "z01"]  # 2 WORK rows, not 0
    assert all(rows[f"a{i:02d}"] == "skip_exists" for i in range(5))

"""M6 training-data pipeline operators: dedup, text analysis,
embedding similarity, multimodal plumbing, event sessionization.

Correctness anchors: exact kernels (ngram jaccard, brute-force
cosine) verify the approximate scale paths (MinHash-LSH, SimHash,
hyperplane-LSH, IVF) by recall, not by oracle SQL.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


# ------------------------------------------------------------------ dedup

def test_exact_dedup_matches_groupby(docs):
    from incubator_hugegraph_spark.data.dedup import exact_dedup
    got = exact_dedup(docs)
    # every reported group really is duplicated, keeper is the min id
    manual = (docs.groupBy("text")
              .agg(F.min("doc_id").alias("k"), F.count("*").alias("n"))
              .filter("n > 1"))
    assert got.count() == manual.count()


def test_normalized_dedup_covers_all_docs(docs):
    from incubator_hugegraph_spark.data.dedup import normalized_dedup
    total = docs.count()
    agg = normalized_dedup(docs).agg(F.sum("n_docs")).collect()[0][0]
    assert agg == total


def test_minhash_lsh_recall_vs_exact(docs):
    from incubator_hugegraph_spark.data.dedup import (
        minhash_lsh_pairs, ngram_jaccard_pairs)
    exact = {(r.d1, r.d2) for r in
             ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()}
    approx = {(r.d1, r.d2) for r in
              minhash_lsh_pairs(docs, n=3, threshold=0.3).collect()}
    # LSH output is exact-verified → no false positives
    assert approx <= exact
    if exact:
        assert len(approx & exact) / len(exact) >= 0.9


def test_simhash_pairs_are_close(docs):
    from incubator_hugegraph_spark.data.dedup import simhash_near_pairs
    rows = simhash_near_pairs(docs, max_hamming=3).collect()
    assert all(r.hamming <= 3 for r in rows)
    # duplicated texts (if any) must land at hamming 0
    dup = (docs.groupBy("text").agg(F.collect_list("doc_id").alias("ids"),
                                    F.count("*").alias("n"))
           .filter("n > 1").collect())
    found = {(r.d1, r.d2) for r in rows}
    for g in dup:
        ids = sorted(g.ids)
        assert (ids[0], ids[1]) in found


# ------------------------------------------------------------------ text

def test_token_stats_spot_check(docs, spark):
    from incubator_hugegraph_spark.data.text import token_stats
    row = docs.orderBy("doc_id").first()
    got = token_stats(docs).filter(F.col("id") == row.doc_id).first()
    import re
    toks = [t for t in re.split(r"[^a-z0-9]+", row.text.lower()) if t]
    assert got.n_tokens == len(toks)
    assert got.n_distinct == len(set(toks))
    assert got.n_chars == len(row.text)


def test_lang_id_known_strings(spark):
    from incubator_hugegraph_spark.data.text import lang_id
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat and the dog"),
         (2, "le chat et les chiens sont dans le jardin"),
         (3, "der Hund und die Katze ist nicht ein Vogel"),
         (4, "你好 world"),
         (5, "xyzzy plugh")],
        "doc_id long, text string")
    got = {r.id: r.lang for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "zh", 5: "und"}


def test_quality_score_bounds(docs):
    from incubator_hugegraph_spark.data.text import quality_score
    q = quality_score(docs)
    bad = q.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count()
    assert bad == 0


def test_fingerprint_is_normalization_invariant(spark):
    from incubator_hugegraph_spark.data.text import fingerprint
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "other text")],
        "doc_id long, text string")
    fps = {r.id: r.fp for r in fingerprint(df).collect()}
    assert fps[1] == fps[2] and fps[1] != fps[3]


# ------------------------------------------------------------- similarity

def test_cosine_topk_is_exact(emb):
    from incubator_hugegraph_spark.data.similarity import cosine_topk
    got = cosine_topk(emb, [0], 5).collect()
    assert len(got) == 5
    sims = [r.sim for r in got]
    assert sims == sorted(sims, reverse=True)
    assert all(r.neighbor_id != 0 for r in got)


def test_lsh_ann_recall(emb):
    from incubator_hugegraph_spark.data.similarity import (
        cosine_topk, lsh_ann_topk)
    qids = [0, 1, 2]
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, qids, 10).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in lsh_ann_topk(emb, qids, 10, dim=64).collect()}
    assert len(approx & exact) / len(exact) >= 0.8


def test_ivf_ann_recall(emb):
    from incubator_hugegraph_spark.data.similarity import (
        cosine_topk, ivf_topk)
    qids = [0, 1, 2]
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, qids, 10).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(emb, qids, 10).collect()}
    assert len(approx & exact) / len(exact) >= 0.7


# ------------------------------------------------------------- multimodal

def test_multimodal_feature_schema_and_determinism(docs):
    """Real header decode (r06): assets carry genuine PNG/WAV/AVI
    containers; width/height/duration are parsed back out of the
    payload bytes and must match the adapter's declared formulas."""
    import math

    from incubator_hugegraph_spark.data.multimodal import (
        docs_as_assets, extract_features)
    feats = extract_features(docs_as_assets(docs))
    a = feats.orderBy("asset_id").limit(9).collect()
    b = feats.orderBy("asset_id").limit(9).collect()
    assert a == b  # deterministic
    texts = {r.doc_id: len(r.text.encode())
             for r in docs.orderBy("doc_id").limit(9).collect()}
    for r in a:
        n = texts[r.asset_id]
        if r.modality == "image":
            w = max(1, math.isqrt(n))
            assert r.width == w and r.height == max(1, -(-n // w))
            assert r.n_bytes == 57 + n and r.duration_ms is None
        elif r.modality == "audio":
            assert r.duration_ms == n * 1000 // 16000
            assert r.n_bytes == 44 + n + n % 2 and r.width is None
        else:
            assert r.duration_ms == max(1, n // 100) * 40
            assert r.n_bytes == 100 + n + n % 2 and r.width is None
        assert len(r.feature) == 8


def test_multimodal_real_world_headers():
    """The parsers handle spec-conformant bytes NOT produced by our
    writers: JPEG SOF0 scan, GIF89a LSD, top-down BMP, and unknown
    bytes fall back to the deterministic stub."""
    import struct

    from incubator_hugegraph_spark.data.multimodal import (
        _parse_bmp, _parse_gif, _parse_jpeg, decode_header)
    jfif = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", 480, 640) + b"\x03"
            + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01")
    assert _parse_jpeg(jfif + sof0 + b"\xff\xd9") == \
        {"width": 640, "height": 480, "duration_ms": None}
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert _parse_gif(gif)["width"] == 320
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600) + b"\x00" * 10
    assert _parse_bmp(bmp) == \
        {"width": 800, "height": 600, "duration_ms": None}
    # ITU T.81 allows 0xFF fill bytes before any marker — the scan
    # must skip them, not read a bogus length (code review r06)
    filled = b"\xff\xd8" + b"\xff\xff\xff" + sof0 + b"\xff\xd9"
    assert _parse_jpeg(filled)["width"] == 640
    # EOI before any SOF → not a decodable frame
    assert _parse_jpeg(b"\xff\xd8\xff\xd9") is None
    # unknown bytes → deterministic stub, never a crash
    assert decode_header(b"\x00\x01\x02", "image")["width"] == 1


def test_data_tier_survives_junk_documents(spark):
    """Data-tier review r06: quality/filter functions must FILTER
    junk docs (empty, whitespace-only, token-free), never abort the
    corpus pass with ANSI DIVIDE_BY_ZERO — an empty doc anywhere in
    100 TB killed the whole job."""
    from incubator_hugegraph_spark.data.clean import gopher_rules
    from incubator_hugegraph_spark.data.text import quality_score
    junk = spark.createDataFrame(
        [(1, "a good doc with the of and words here then"),
         (2, ""), (3, "!!!"), (4, " \n \n ")],
        "doc_id long, text string")
    g = {r[0]: r["keep"] for r in gopher_rules(junk).collect()}
    assert g[2] is False and g[3] is False and g[4] is False
    q = {r.id: r.quality for r in quality_score(junk).collect()}
    assert q[2] == 0.0 and q[3] == 0.0 and q[4] == 0.0


def test_cosine_zero_norm_and_empty_inputs(spark):
    """Zero-norm vectors (including centroids kmeans averages to zero
    from antipodal members) score 0.0 instead of crashing; empty
    embedding inputs return empty results, not TypeErrors."""
    from pyspark.sql import functions as F

    from incubator_hugegraph_spark.data.dedup import semantic_dedup
    from incubator_hugegraph_spark.data.similarity import (
        _to_double, cosine_topk, ivf_topk, kmeans_centroids,
        kmeans_cluster_stats)
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [-1.0, 0.0]), (3, [0.0, 0.0]),
         (4, [0.5, 0.5])],
        "vec_id long, embedding array<double>")
    sims = {r.neighbor_id: r.sim for r in cosine_topk(emb, [1], 3)
            .collect()}
    assert sims[3] == 0.0  # zero vector scores 0, no crash
    base = emb.select(F.col("vec_id").alias("id"),
                      _to_double("embedding").alias("v"))
    # antipodal members can average a centroid to the zero vector —
    # the refine round must survive it
    assert kmeans_centroids(base, 2, 2, 1).count() == 2
    none = emb.filter("vec_id < 0")
    assert semantic_dedup(none).count() == 0
    assert ivf_topk(none, [1], 3).count() == 0
    assert kmeans_cluster_stats(none).count() == 0


def test_cm_estimate_empty_buckets_count_zero(spark):
    """A never-seen key estimates 0 (empty buckets participate in the
    min) instead of vanishing from the output or inheriting a
    colliding hot bucket's count."""
    from incubator_hugegraph_spark.data.sketch import (cm_estimate,
                                                       count_min)
    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 3, "k string")
    cms = count_min(df, "k")
    probes = spark.createDataFrame([("a",), ("zzz_never",)], "k string")
    est = {r.key: r.est for r in cm_estimate(cms, probes, "k").collect()}
    assert est == {"a": 5, "zzz_never": 0}


def test_pii_counts_equal_replacements(spark):
    """Each n_<kind> equals the number of <KIND> replacements made —
    a span matching two patterns (IPv4 also matching the looser phone
    regex) is counted once, under the kind that redacted it."""
    from incubator_hugegraph_spark.data.clean import pii_redact
    docs = spark.createDataFrame(
        [(1, "host 192.168.100.200 up"), (2, "ssn 123-45-6789 ok")],
        "doc_id long, text string")
    rows = {r.id: r for r in pii_redact(docs).collect()}
    assert rows[1].n_ipv4 == 1 and rows[1].n_phone == 0
    assert rows[1].redacted == "host <IPV4> up"
    assert rows[2].n_ssn == 1 and rows[2].n_phone == 0


def test_token_budget_sample_empty_input(spark):
    """An upstream filter wiping the corpus yields an empty result
    with the declared schema, not a None-comparison TypeError."""
    from pyspark.sql import functions as F

    from incubator_hugegraph_spark.data.sample import token_budget_sample
    empty = spark.createDataFrame([], "doc_id long, text string") \
        .withColumn("score", F.lit(None).cast("double"))
    out = token_budget_sample(empty, 100)
    assert out.count() == 0
    assert out.columns == ["id", "n_tokens", "score", "cum_before",
                           "keep"]


def test_dedup_keep_best_custom_id_col(spark):
    """dedup_keep_best honors id_col end-to-end (the join and final
    select previously hardcoded 'doc_id')."""
    from pyspark.sql import functions as F

    from incubator_hugegraph_spark.data.dedup import dedup_keep_best
    d = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again"),
         (2, "the quick brown fox jumps over the lazy dog again ok")],
        "my_id long, text string").withColumn("n_chars",
                                              F.length("text"))
    out = dedup_keep_best(d, id_col="my_id")
    assert out.columns == ["keeper", "kept_doc", "score"]
    assert out.count() == 1


def test_wav_declared_riff_size_covers_pad():
    """The RIFF header's size field must cover the data chunk's
    word-alignment pad byte — a strict reader trusting the declared
    size would otherwise see a truncated container (code review
    r06)."""
    import struct

    from incubator_hugegraph_spark.data.multimodal import wrap_wav
    for n in (7, 8):  # odd (padded) and even (no pad)
        b = wrap_wav(b"x" * n)
        declared, = struct.unpack("<I", b[4:8])
        assert 8 + declared == len(b), (n, declared, len(b))


def test_sample_frames_counts(docs):
    from incubator_hugegraph_spark.data.multimodal import (
        docs_as_assets, sample_frames)
    frames = sample_frames(docs_as_assets(docs), every_ms=1000)
    r = frames.groupBy("asset_id").count().first()
    assert r["count"] >= 1


def test_paragraph_dedup_newline_corpus(spark):
    """RefinedWeb-style paragraph dedup over REAL newline structure:
    the shared footer vanishes from every doc, unique paragraphs
    survive in original order, and a doc that was ONLY boilerplate
    survives with empty clean_text."""
    from incubator_hugegraph_spark.data.dedup import (
        paragraph_dedup, split_paragraphs)
    footer = "subscribe to our newsletter"
    rows = [
        (1, f"alpha one\n\n{footer}\n\nbeta two"),
        (2, f"{footer}\n\ngamma three"),
        (3, footer),
        (4, "delta four\n\nepsilon five"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in paragraph_dedup(
        split_paragraphs(docs), min_docs=2).collect()}
    assert out[1].clean_text == "alpha one\n\nbeta two"
    assert (out[1].n_kept, out[1].n_removed) == (2, 1)
    assert out[2].clean_text == "gamma three"
    assert out[3].clean_text == "" and out[3].n_removed == 1
    assert out[4].clean_text == "delta four\n\nepsilon five"
    assert out[4].n_removed == 0
    # min_docs=3: the footer appears in 3 docs, still removed; a
    # pair-only duplicate would survive
    rows2 = rows + [(5, "alpha one")]  # 'alpha one' now in 2 docs
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    out3 = {r.doc_id: r for r in paragraph_dedup(
        split_paragraphs(docs2), min_docs=3).collect()}
    assert out3[1].clean_text == "alpha one\n\nbeta two"  # pair kept
    assert out3[3].clean_text == ""  # triple removed


def test_word_window_paragraphs_shape(spark):
    """Flat-corpus splitter: exact 16-word windows, remainder tail,
    positional indexes."""
    from incubator_hugegraph_spark.data.dedup import (
        word_window_paragraphs)
    text = " ".join(f"w{i}" for i in range(35))  # 16 + 16 + 3
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = (word_window_paragraphs(docs, words=16)
           .orderBy("para_idx").collect())
    assert [r.para_idx for r in got] == [0, 1, 2]
    assert got[0].para.split(" ") == [f"w{i}" for i in range(16)]
    assert got[2].para == "w32 w33 w34"


def test_dhash_perceptual_properties(spark):
    """dHash rides pixel structure: sparse pixel edits move the hash
    by a few bits, while unrelated images differ widely; the generic
    chunked-Hamming join finds exactly the brute-force pairs at the
    pigeonhole-exact threshold."""
    import numpy as np

    from incubator_hugegraph_spark.data.dedup import hamming_near_pairs
    from incubator_hugegraph_spark.data.multimodal import (
        dhash_rgb, encode_png_rgb, synth_media_bytes)
    w, h = 20, 15
    base = synth_media_bytes(3, w * h * 3)
    png_a = encode_png_rgb(base.tobytes(), w, h)
    ham_a = dhash_rgb(png_a)
    # one flipped pixel: hamming stays tiny (<= 4 bits: one gray cell
    # affects at most its two horizontal comparisons per sample hit)
    tweaked = base.copy().astype(np.int64)
    tweaked[:3] = (tweaked[:3] + 128) % 256
    ham_b = dhash_rgb(encode_png_rgb(
        tweaked.astype(np.uint8).tobytes(), w, h))
    assert bin((ham_a ^ ham_b) & ((1 << 64) - 1)).count("1") <= 4
    # an unrelated image lands far away
    other = dhash_rgb(encode_png_rgb(
        synth_media_bytes(99, w * h * 3).tobytes(), w, h))
    assert bin((ham_a ^ other) & ((1 << 64) - 1)).count("1") > 8
    # bucket join == brute force at max_hamming <= 3 (pigeonhole)
    rows = [(1, 0b1010), (2, 0b1011), (3, 0b1010 - (1 << 63)),
            (4, -(1 << 63)), (5, 0b1010 | (1 << 20) | (1 << 40))]
    hashes = spark.createDataFrame(rows, "id long, fp long")
    got = {(r.d1, r.d2, r.hamming)
           for r in hamming_near_pairs(hashes, 3, hash_col="fp",
                                       id_col="id").collect()}
    brute = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = bin((rows[i][1] ^ rows[j][1])
                    & ((1 << 64) - 1)).count("1")
            if d <= 3:
                brute.add((rows[i][0], rows[j][0], d))
    assert got == brute and len(brute) >= 2


def test_video_neardup_shared_frames(spark):
    """Shared-frame video pairing: videos sharing >= min_shared
    distinct frame hashes pair; stop-hashes (frames in > max_df
    videos) are dropped before the join."""
    import numpy as np

    from incubator_hugegraph_spark.data.multimodal import (
        build_avi, frame_dhashes, video_neardup_pairs)

    def frame(seed):
        # random bytes, NOT the linear generator: constant-shift
        # streams are perceptually identical under dHash (by design —
        # brightness invariance), which would alias distinct shots
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, 768, dtype=np.uint8).tobytes()

    common = frame(1), frame(2)            # two shared shots
    stop = frame(42)                        # appears in ALL videos
    rows = [
        (1, "video", build_avi([common[0], common[1], stop])),
        (2, "video", build_avi([common[0], common[1], stop,
                                frame(25)])),
        (3, "video", build_avi([common[0], stop, frame(37)])),
        (4, "video", build_avi([stop, frame(49)])),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, modality string, payload binary")
    fh = frame_dhashes(assets)
    got = {(r.d1, r.d2): r.n_shared
           for r in video_neardup_pairs(fh, min_shared=2,
                                        max_df=3).collect()}
    # stop frame is in 4 > max_df=3 videos → removed; only (1,2)
    # share two distinct surviving hashes
    assert got == {(1, 2): 2}
    # with the stop hash allowed, (1,3)/(2,3) reach 2 shared and
    # (1,4)... only shares the stop frame → still < 2
    got2 = {(r.d1, r.d2): r.n_shared
            for r in video_neardup_pairs(fh, min_shared=2,
                                         max_df=10).collect()}
    assert got2[(1, 2)] == 3 and got2[(1, 3)] == 2 \
        and got2[(2, 3)] == 2 and (1, 4) not in got2


def test_incremental_video_frames_equals_batch(spark, tmp_path):
    """Streaming video twin (r08): folding the asset files through
    incremental_video_frames_batch accumulates EXACTLY the frame-hash
    index a one-shot frame_dhashes produces, so video_neardup_pairs
    over the streamed state equals the batch kernel row-for-row —
    including MIXED codecs (raw-DIB AVI and animated GIF in the same
    stream, both riding the shared decode)."""
    import numpy as np

    from incubator_hugegraph_spark.data.gif import (
        encode_gif_gray_frames)
    from incubator_hugegraph_spark.data.multimodal import (
        build_avi, frame_dhashes, video_neardup_pairs)
    from incubator_hugegraph_spark.streaming.incremental import (
        incremental_video_neardup_stream)

    def frame(seed):
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, 768, dtype=np.uint8).tobytes()

    def gray(seed):
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, 256, dtype=np.uint8).tobytes()

    shared = frame(1), frame(2)
    g_shared = gray(7), gray(8)
    rows = [
        (1, "video", build_avi([shared[0], shared[1], frame(30)])),
        (2, "video", build_avi([shared[0], shared[1]])),
        (3, "video", build_avi([shared[0], frame(31)])),
        # animated GIFs sharing frames with each other
        (4, "video", encode_gif_gray_frames(
            [g_shared[0], g_shared[1]], 16, 16)),
        (5, "video", encode_gif_gray_frames(
            [g_shared[0], g_shared[1], gray(9)], 16, 16)),
        (6, "video", build_avi([frame(50)])),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, modality string, payload binary")
    want = sorted(map(tuple, video_neardup_pairs(
        frame_dhashes(assets), min_shared=2, max_df=10).collect()))
    assert want and (4, 5) in {(a, b) for a, b, _ in want}
    adir = str(tmp_path / "assets")
    assets.repartition(3).write.parquet(adir)
    q, get_state = incremental_video_neardup_stream(
        spark, adir, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination()
    got = sorted(map(tuple, video_neardup_pairs(
        get_state(), min_shared=2, max_df=10).collect()))
    assert got == want


def test_delta_state_fold_io_and_restart(spark, tmp_path):
    """r09 (r08 verdict item 1): append-only streaming folds persist
    per-batch state DELTAS (b*/state_delta) instead of rewriting the
    full accumulated state every micro-batch. Asserts (a) committed
    batch dirs carry a state_delta and NO full-state snapshot, (b)
    the deltas partition the index — row counts sum to the index
    size, so per-batch write IO is O(batch) and total IO O(|state|),
    (c) a stopped-and-resumed stream (more files arrived in between)
    reconstructs its state from the committed deltas — the final
    index equals the one-shot batch kernel."""
    import os

    import numpy as np

    from incubator_hugegraph_spark.data.multimodal import (
        build_avi, frame_dhashes)
    from incubator_hugegraph_spark.streaming.incremental import (
        incremental_video_neardup_stream)

    def frame(seed):
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, 768, dtype=np.uint8).tobytes()

    def assets_df(ids):
        rows = [(i, "video", build_avi([frame(i), frame(i + 100)]))
                for i in ids]
        return spark.createDataFrame(
            rows, "asset_id long, modality string, payload binary")

    adir, ckpt = str(tmp_path / "assets"), str(tmp_path / "ckpt")
    assets_df([1, 2, 3]).repartition(3).write.parquet(adir)
    q1, gs1 = incremental_video_neardup_stream(
        spark, adir, ckpt, max_files_per_trigger=1)
    q1.awaitTermination()
    snap = f"{ckpt}/__vnd_snapshots"
    bdirs = sorted(d for d in os.listdir(snap) if d.startswith("b"))
    assert len(bdirs) >= 2  # maxFilesPerTrigger=1 → several batches
    delta_rows = 0
    for d in bdirs:
        assert os.path.exists(f"{snap}/{d}/_DONE")
        assert os.path.isdir(f"{snap}/{d}/state_delta")
        assert not os.path.exists(f"{snap}/{d}/state")  # no full snap
        delta_rows += spark.read.parquet(
            f"{snap}/{d}/state_delta").count()
    assert delta_rows == gs1().count()  # deltas PARTITION the index
    # more assets arrive; a fresh driver resumes the same checkpoint
    assets_df([4, 5]).repartition(2).write.parquet(
        adir, mode="append")
    q2, gs2 = incremental_video_neardup_stream(
        spark, adir, ckpt, max_files_per_trigger=1)
    q2.awaitTermination()
    want = {(r.asset_id, r.fhash) for r in frame_dhashes(
        assets_df([1, 2, 3, 4, 5])).select("asset_id", "fhash")
        .distinct().collect()}
    assert {(r.asset_id, r.fhash) for r in gs2().collect()} == want


def test_delta_state_pairs_fold_restart(spark, tmp_path):
    """Delta-state restart for a PAIRS fold (image dHash): the
    resumed stream must rebuild its band state from the committed
    state_delta dirs, so pairs spanning the restart boundary (one
    member before, one after) still surface; the accumulated pairs
    equal the one-shot batch kernel."""
    import numpy as np

    from incubator_hugegraph_spark.data.dedup import hamming_near_pairs
    from incubator_hugegraph_spark.data.multimodal import (
        encode_png_rgb, image_dhash, synth_media_bytes)
    from incubator_hugegraph_spark.streaming.incremental import (
        incremental_image_neardup_stream)

    def edited_png(stream_seed, member):
        raw = synth_media_bytes(stream_seed, 12 * 10 * 3).astype(
            np.int64)
        idx = np.arange(raw.size, dtype=np.int64)
        m = (idx * 31 + member) % 97 == 0
        raw[m] = (raw[m] + 128) % 256
        return encode_png_rgb(raw.astype(np.uint8).tobytes(), 12, 10)

    def assets_df(ids):
        rows = [(i, "image", edited_png(i % 10 if i != 99 else 99, i))
                for i in ids]
        return spark.createDataFrame(
            rows, "asset_id long, modality string, payload binary")

    adir, ckpt = str(tmp_path / "assets"), str(tmp_path / "ckpt")
    # group members 1/11 arrive pre-restart, 21 post-restart: the
    # (1,21)/(11,21) pairs exist ONLY if the resumed state covers
    # the pre-restart band rows
    assets_df([1, 11, 99]).repartition(2).write.parquet(adir)
    q1, _ = incremental_image_neardup_stream(
        spark, adir, ckpt, max_files_per_trigger=1)
    q1.awaitTermination()
    assets_df([21, 2]).repartition(1).write.parquet(
        adir, mode="append")
    q2, get_pairs = incremental_image_neardup_stream(
        spark, adir, ckpt, max_files_per_trigger=1)
    q2.awaitTermination()
    want = {(r.d1, r.d2, r.hamming)
            for r in hamming_near_pairs(
                image_dhash(assets_df([1, 11, 99, 21, 2])), 3,
                hash_col="dhash", id_col="asset_id").collect()}
    assert any(d2 == 21 for _, d2, _ in want)  # boundary pair planted
    assert {(r.d1, r.d2, r.hamming)
            for r in get_pairs().collect()} == want


def test_delta_state_legacy_snapshot_migration(spark, tmp_path):
    """r09 review: a checkpoint written by the PRE-delta protocol
    (full b*/state snapshots) resumed under delta_state must NOT
    silently start from an empty index — the engine's offset log
    still skips the committed batches, so dropped state would lose
    every pair spanning the upgrade boundary. The newest full
    snapshot is the union of all rows so far (append-only state), so
    it slots in as the base delta. Simulated by converting a
    delta-format checkpoint to the legacy layout in place."""
    import os
    import shutil

    import numpy as np

    from incubator_hugegraph_spark.data.dedup import hamming_near_pairs
    from incubator_hugegraph_spark.data.multimodal import (
        encode_png_rgb, image_dhash, synth_media_bytes)
    from incubator_hugegraph_spark.streaming.incremental import (
        incremental_image_neardup_stream)

    def edited_png(stream_seed, member):
        raw = synth_media_bytes(stream_seed, 12 * 10 * 3).astype(
            np.int64)
        idx = np.arange(raw.size, dtype=np.int64)
        m = (idx * 31 + member) % 97 == 0
        raw[m] = (raw[m] + 128) % 256
        return encode_png_rgb(raw.astype(np.uint8).tobytes(), 12, 10)

    def assets_df(ids):
        rows = [(i, "image", edited_png(i % 10 if i != 99 else 99, i))
                for i in ids]
        return spark.createDataFrame(
            rows, "asset_id long, modality string, payload binary")

    adir, ckpt = str(tmp_path / "assets"), str(tmp_path / "ckpt")
    assets_df([1, 11, 99]).repartition(2).write.parquet(adir)
    q1, _ = incremental_image_neardup_stream(
        spark, adir, ckpt, max_files_per_trigger=1)
    q1.awaitTermination()
    # convert the snapshot dirs to the LEGACY layout: accumulated
    # state as one b{last}/state snapshot, no state_delta dirs
    snap = f"{ckpt}/__ind_snapshots"
    bdirs = sorted((int(d[1:]) for d in os.listdir(snap)
                    if d.startswith("b")))
    deltas = [f"{snap}/b{b}/state_delta" for b in bdirs
              if os.path.isdir(f"{snap}/b{b}/state_delta")]
    full = spark.read.parquet(*deltas).localCheckpoint()
    for d in deltas:
        shutil.rmtree(d)
    full.write.parquet(f"{snap}/b{bdirs[-1]}/state")
    # upgrade-boundary member 21 arrives; the resumed stream must
    # see the legacy state
    assets_df([21, 2]).repartition(1).write.parquet(
        adir, mode="append")
    q2, get_pairs = incremental_image_neardup_stream(
        spark, adir, ckpt, max_files_per_trigger=1)
    q2.awaitTermination()
    want = {(r.d1, r.d2, r.hamming)
            for r in hamming_near_pairs(
                image_dhash(assets_df([1, 11, 99, 21, 2])), 3,
                hash_col="dhash", id_col="asset_id").collect()}
    assert any(d2 == 21 for _, d2, _ in want)
    assert {(r.d1, r.d2, r.hamming)
            for r in get_pairs().collect()} == want


def test_delta_state_compaction_bounds_paths_and_restarts(
        spark, tmp_path, monkeypatch):
    """r10 optimization: every COMPACT_EVERY committed batches the
    delta chain folds into ONE b{N}/state base (the legacy-migration
    read slot), so the per-batch multi-path plan stays bounded on
    long streams. Asserts (a) compaction fired (some b*/state exists,
    subsumed state_delta dirs pruned), (b) the in-session path list
    is bounded by COMPACT_EVERY+1, (c) the final index still equals
    the one-shot batch kernel, and (d) a RESTART after compaction
    (more files arrive) stacks new deltas on the compacted base —
    the crash-window shape (base + _DONE-committed deltas) is
    exactly what the resume path reads."""
    import os

    import numpy as np

    import incubator_hugegraph_spark.streaming.incremental as inc
    from incubator_hugegraph_spark.data.multimodal import (
        build_avi, frame_dhashes)

    monkeypatch.setattr(inc, "COMPACT_EVERY", 2)

    def frame(seed):
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, 768, dtype=np.uint8).tobytes()

    def assets_df(ids):
        rows = [(i, "video", build_avi([frame(i), frame(i + 100)]))
                for i in ids]
        return spark.createDataFrame(
            rows, "asset_id long, modality string, payload binary")

    adir, ckpt = str(tmp_path / "assets"), str(tmp_path / "ckpt")
    assets_df([1, 2, 3, 4]).repartition(4).write.parquet(adir)
    q1, gs1 = inc.incremental_video_neardup_stream(
        spark, adir, ckpt, max_files_per_trigger=1)
    q1.awaitTermination()
    snap = f"{ckpt}/__vnd_snapshots"
    bdirs = sorted(int(d[1:]) for d in os.listdir(snap)
                   if d.startswith("b"))
    bases = [b for b in bdirs
             if os.path.isdir(f"{snap}/b{b}/state")]
    assert bases, "compaction never fired at COMPACT_EVERY=2"
    base_b = max(bases)
    # subsumed deltas pruned; only post-base deltas (≤ COMPACT_EVERY)
    # may remain
    leftover = [b for b in bdirs
                if os.path.isdir(f"{snap}/b{b}/state_delta")]
    assert all(b > base_b for b in leftover)
    assert len(leftover) <= 2
    want4 = {(r.asset_id, r.fhash) for r in frame_dhashes(
        assets_df([1, 2, 3, 4])).select("asset_id", "fhash")
        .distinct().collect()}
    assert {(r.asset_id, r.fhash) for r in gs1().collect()} == want4
    # restart after compaction: new files stack deltas on the base
    assets_df([5, 6]).repartition(2).write.parquet(adir, mode="append")
    q2, gs2 = inc.incremental_video_neardup_stream(
        spark, adir, ckpt, max_files_per_trigger=1)
    q2.awaitTermination()
    want6 = {(r.asset_id, r.fhash) for r in frame_dhashes(
        assets_df([1, 2, 3, 4, 5, 6])).select("asset_id", "fhash")
        .distinct().collect()}
    assert {(r.asset_id, r.fhash) for r in gs2().collect()} == want6


def test_pairs_delta_compaction_bounds_paths_and_restarts(
        spark, tmp_path, monkeypatch):
    """r10 optimization, pairs twin of the state-compaction test: the
    accumulated near-dup pairs are one delta dir per committed batch,
    so their multi-path scan grew O(B) with stream lifetime. Every
    COMPACT_EVERY batches they fold into ONE b{N}/pairs_base. Asserts
    (a) compaction fired and subsumed pairs deltas were pruned,
    (b) the in-session path list stays bounded, (c) NO pair is lost
    across compaction (pairs are the accumulated result — the base
    must hold every pair ever emitted), and (d) a restart after
    compaction resumes from base + newer deltas and still matches the
    one-shot batch kernel, including pairs whose members span the
    compaction boundary."""
    import os

    import numpy as np

    import incubator_hugegraph_spark.streaming.incremental as inc
    from incubator_hugegraph_spark.data.dedup import hamming_near_pairs
    from incubator_hugegraph_spark.data.multimodal import (
        encode_png_rgb, image_dhash, synth_media_bytes)

    monkeypatch.setattr(inc, "COMPACT_EVERY", 2)

    def edited_png(stream_seed, member):
        raw = synth_media_bytes(stream_seed, 12 * 10 * 3).astype(
            np.int64)
        idx = np.arange(raw.size, dtype=np.int64)
        m = (idx * 31 + member) % 97 == 0
        raw[m] = (raw[m] + 128) % 256
        return encode_png_rgb(raw.astype(np.uint8).tobytes(), 12, 10)

    def assets_df(ids):
        rows = [(i, "image", edited_png(i % 10 if i != 99 else 99, i))
                for i in ids]
        return spark.createDataFrame(
            rows, "asset_id long, modality string, payload binary")

    adir, ckpt = str(tmp_path / "assets"), str(tmp_path / "ckpt")
    # 4 single-file batches; 1/11 are near-dups (pair emitted in an
    # EARLY batch, i.e. before compaction fires at COMPACT_EVERY=2)
    assets_df([1, 11, 99, 2]).repartition(4).write.parquet(adir)
    q1, gp1 = inc.incremental_image_neardup_stream(
        spark, adir, ckpt, max_files_per_trigger=1)
    q1.awaitTermination()
    snap = f"{ckpt}/__ind_snapshots"
    bdirs = sorted(int(d[1:]) for d in os.listdir(snap)
                   if d.startswith("b"))
    pbases = [b for b in bdirs
              if os.path.isdir(f"{snap}/b{b}/pairs_base")]
    assert pbases, "pairs compaction never fired at COMPACT_EVERY=2"
    pbase_b = max(pbases)
    leftover = [b for b in bdirs
                if os.path.isdir(f"{snap}/b{b}/pairs")]
    assert all(b > pbase_b for b in leftover)
    assert len(leftover) <= 2
    want4 = {(r.d1, r.d2, r.hamming)
             for r in hamming_near_pairs(
                 image_dhash(assets_df([1, 11, 99, 2])), 3,
                 hash_col="dhash", id_col="asset_id").collect()}
    assert want4, "no pre-compaction pair planted"
    assert {(r.d1, r.d2, r.hamming)
            for r in gp1().collect()} == want4
    # restart after compaction: 21 joins the 1/11 group — its pairs
    # need band rows from the compacted base AND the post-base deltas
    assets_df([21, 3]).repartition(2).write.parquet(
        adir, mode="append")
    q2, gp2 = inc.incremental_image_neardup_stream(
        spark, adir, ckpt, max_files_per_trigger=1)
    q2.awaitTermination()
    want6 = {(r.d1, r.d2, r.hamming)
             for r in hamming_near_pairs(
                 image_dhash(assets_df([1, 11, 99, 2, 21, 3])), 3,
                 hash_col="dhash", id_col="asset_id").collect()}
    assert any(d2 == 21 for _, d2, _ in want6)
    assert {(r.d1, r.d2, r.hamming)
            for r in gp2().collect()} == want6


def test_incremental_image_neardup_equals_batch(spark, tmp_path):
    """Folding image micro-batches through the streaming dHash state
    accumulates EXACTLY the batch run's pairs — every pair surfaces
    once, when its later member arrives."""
    import numpy as np

    from incubator_hugegraph_spark.data.dedup import hamming_near_pairs
    from incubator_hugegraph_spark.data.multimodal import (
        encode_png_rgb, image_dhash, synth_media_bytes)
    from incubator_hugegraph_spark.streaming.incremental import (
        incremental_image_neardup_stream)

    def edited_png(stream_seed, member):
        # same base stream per group, sparse per-member pixel edits →
        # NONZERO hamming within groups, so the test exercises the
        # partial-chunk banding path, not just identical-hash matches
        # (review r06)
        raw = synth_media_bytes(stream_seed, 12 * 10 * 3).astype(
            np.int64)
        idx = np.arange(raw.size, dtype=np.int64)
        m = (idx * 31 + member) % 97 == 0
        raw[m] = (raw[m] + 128) % 256
        return encode_png_rgb(raw.astype(np.uint8).tobytes(), 12, 10)

    # groups across batches: ids 1/11/21 share stream 1, 2/12 share
    # stream 2; 99 unrelated
    rows = [(i, "image", edited_png(i % 10 if i != 99 else 99, i))
            for i in (1, 11, 21, 2, 12, 99)]
    assets = spark.createDataFrame(
        rows, "asset_id long, modality string, payload binary")
    want = {(r.d1, r.d2, r.hamming)
            for r in hamming_near_pairs(
                image_dhash(assets), 3, hash_col="dhash",
                id_col="asset_id").collect()}
    assert want  # the fixture must actually contain near-dups
    assert any(h > 0 for _, _, h in want)  # nonzero-hamming planted
    adir = str(tmp_path / "assets")
    assets.repartition(3).write.parquet(adir)
    q, get_pairs = incremental_image_neardup_stream(
        spark, adir, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination()
    got = {(r.d1, r.d2, r.hamming) for r in get_pairs().collect()}
    assert got == want


def test_audio_fingerprint_properties():
    """Energy-contour fingerprint: sparse sample edits move few bits,
    an unrelated signal lands far; undecodable bytes → None."""
    import numpy as np

    from incubator_hugegraph_spark.data.multimodal import (
        audio_fingerprint, render_media_wav, synth_media_samples,
        wrap_wav)
    wav = render_media_wav(7, 1000)
    fp = audio_fingerprint(wav)
    assert fp is not None
    # flip three samples: at most a handful of window energies move
    s = synth_media_samples(7, 1000).astype(np.int64)
    s[[10, 500, 900]] = ((s[[10, 500, 900]] + 32768 + 16384)
                         % 65536) - 32768
    fp2 = audio_fingerprint(wrap_wav(s.astype("<i2").tobytes()))
    assert bin((fp ^ fp2) & ((1 << 64) - 1)).count("1") <= 12
    other = audio_fingerprint(render_media_wav(91, 1000))
    assert bin((fp ^ other) & ((1 << 64) - 1)).count("1") > 8
    assert audio_fingerprint(b"not audio") is None
    # short clip (< 65 samples → empty windows) still fingerprints
    assert audio_fingerprint(render_media_wav(3, 20)) is not None


def test_png_pixel_roundtrip_all_filters():
    """encode_png_rgb rotates through all five PNG filter types; the
    decoder must invert each (None/Sub/Up/Average/Paeth) to recover
    the raw pixels bit-exactly — random data, not just the synth
    formula, so filter/unfilter bugs can't cancel out."""
    import numpy as np

    from incubator_hugegraph_spark.data.multimodal import (
        decode_png_rgb, encode_png_rgb)
    rng = np.random.RandomState(11)
    for w, h in [(6, 9), (1, 7), (13, 1), (2, 2)]:
        raw = rng.randint(0, 256, w * h * 3, dtype=np.uint8).tobytes()
        png = encode_png_rgb(raw, w, h)
        got_w, got_h, got = decode_png_rgb(png)
        assert (got_w, got_h) == (w, h)
        assert bytes(got) == raw
    # the decoder refuses shapes outside the 8-bit RGB subset
    import struct
    import zlib as _z
    bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)  # RGBA

    def chunk(cc, data):
        crc = _z.crc32(cc + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + cc + data + \
            struct.pack(">I", crc)
    rgba = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", bad_ihdr)
            + chunk(b"IDAT", _z.compress(b"\x00" * 36))
            + chunk(b"IEND", b""))
    assert decode_png_rgb(rgba) is None


def test_decode_media_tolerates_undecodable_payloads(docs):
    """Malformed-but-signed payloads must map to n_values=0 / NULL
    stats, never a task-killing raise (review r06: docs_as_assets'
    header-only PNGs carry non-zlib IDATs and crashed decode_media
    with zlib.error; an invalid filter byte decoded as garbage)."""
    import struct
    import zlib as _z

    from incubator_hugegraph_spark.data.multimodal import (
        decode_media, decode_png_rgb, docs_as_assets, resize_image_rgb,
        wrap_png)
    # direct: wrap_png's IDAT is NOT a zlib stream
    assert decode_png_rgb(wrap_png(b"hello world bytes", 4, 2)) is None
    # invalid filter byte (spec allows 0-4 only) → undecodable
    seq = b"\x07" + b"\x00" * 6  # one 2x1 scanline, filter byte 7
    bad = (b"\x89PNG\r\n\x1a\n"
           + b"".join([struct.pack(">I", 13) + b"IHDR"
                       + struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
                       + struct.pack(">I", 0)])
           + struct.pack(">I", len(_z.compress(seq))) + b"IDAT"
           + _z.compress(seq) + struct.pack(">I", 0)
           + struct.pack(">I", 0) + b"IEND" + struct.pack(">I", 0))
    assert decode_png_rgb(bad) is None
    assert resize_image_rgb(bad, 4) is None
    # end-to-end: the header-level adapter's corpus must flow through
    # decode_media without raising; its PNGs/AVIs are undecodable
    # (n_values=0), its WAVs are genuine PCM
    out = decode_media(docs_as_assets(docs.limit(9))).collect()
    by_mod = {}
    for r in out:
        by_mod.setdefault(r.modality, []).append(r)
    assert all(r.n_values == 0 and r.val_sum is None
               for r in by_mod.get("image", []))
    assert all(r.n_values > 0 for r in by_mod.get("audio", []))


def test_media_decode_matches_generator_formula():
    """decode_media recovers the documented synth streams from the
    real containers: PNG inflate+unfilter, WAV PCM unpack, AVI movi
    walk — exact integer stats."""
    import numpy as np

    from incubator_hugegraph_spark.data.multimodal import (
        decode_avi_frames, decode_wav_samples, render_media_avi,
        render_media_png, render_media_wav, synth_media_bytes,
        synth_media_samples, decode_png_rgb)
    w, h, png = 5, 8, render_media_png(9, 5, 8)
    _, _, raw = decode_png_rgb(png)
    assert np.array_equal(np.frombuffer(bytes(raw), np.uint8),
                          synth_media_bytes(9, w * h * 3))
    assert np.array_equal(decode_wav_samples(render_media_wav(4, 33)),
                          synth_media_samples(4, 33))
    _, _, frames = decode_avi_frames(render_media_avi(8, 2))
    assert np.array_equal(
        np.frombuffer(b"".join(frames), np.uint8),
        np.concatenate([synth_media_bytes(8, 768, offset=f * 769)
                        for f in range(2)]))
    # FRAME_STRIDE rationale: adjacent frames must actually differ
    # (a 768 stride collapses mod 256)
    assert frames[0] != frames[1]


def test_mjpeg_avi_decode_exact_and_guards():
    """Motion-JPEG AVI (r08, the last stubbed modality): each '00dc'
    chunk under the MJPG fourcc is a whole baseline JPEG; with the
    block-constant-gray geometry the lossy per-frame chain is exactly
    invertible, so decoded frames equal the generator formula
    byte-for-byte. Guards: non-MJPG compressed chunks stay
    undecoded (declared boundary), a corrupt frame is skipped — not
    faked — and the raw-DIB leg is unchanged by the codec plumbing."""
    import struct

    import numpy as np

    from incubator_hugegraph_spark.data.multimodal import (
        FRAME_STRIDE, build_avi, decode_avi_frames, render_media_mjpeg,
        synth_media_bytes)
    from incubator_hugegraph_spark.data.jpeg import encode_jpeg_rgb
    for aid, nf, bw, bh in ((7, 3, 2, 3), (12, 1, 1, 1), (3, 4, 4, 2)):
        w, h, frames = decode_avi_frames(
            render_media_mjpeg(aid, nf, bw, bh))
        assert (w, h, len(frames)) == (bw * 8, bh * 8, nf)
        for f, frame in enumerate(frames):
            img = np.frombuffer(frame, np.uint8).reshape(h, w, 3)
            vals = synth_media_bytes(aid, bw * bh,
                                     offset=f * FRAME_STRIDE) \
                .reshape(bh, bw)
            want = np.repeat(np.repeat(vals, 8, 0), 8, 1)
            assert (img == want[..., None]).all()
    # a '00dc' stream under a codec we don't implement decodes no
    # frames (dims still parse) — the honest None-not-fake boundary
    jf = encode_jpeg_rgb(bytes(192), 8, 8)
    w, h, frames = decode_avi_frames(
        build_avi([jf], width=8, height=8, codec=b"XVID"))
    assert (w, h, frames) == (8, 8, [])
    # a corrupt JPEG frame is skipped; the good ones still decode
    good = render_media_mjpeg(5, 2, 1, 1)
    corrupt = build_avi([jf[:20], jf], width=8, height=8,
                        codec=b"MJPG")
    w, h, frames = decode_avi_frames(corrupt)
    assert (w, h, len(frames)) == (8, 8, 1)
    # a frame whose JPEG dims disagree with strf is skipped too
    mism = build_avi([encode_jpeg_rgb(bytes(16 * 16 * 3), 16, 16)],
                     width=8, height=8, codec=b"MJPG")
    assert decode_avi_frames(mism)[2] == []
    # an odd-length chunk must not desync the word-aligned walker:
    # the undecodable 7-byte chunk is padded to 8, so the valid JPEG
    # after it is still found
    odd = build_avi([b"\xff\xd8\xff\xd9\x00\x00\x00", jf],
                    width=8, height=8, codec=b"MJPG")
    w, h, frames = decode_avi_frames(odd)
    assert (w, h, len(frames)) == (8, 8, 1)
    w, h, frames = decode_avi_frames(good)
    assert len(frames) == 2
    # MULTI-STREAM layout (review r08): a real MJPEG AVI usually has
    # an audio strl BEFORE the video strl — the parser must find the
    # 'vids' strh (and ITS strf), not the first strh in hdrl, or the
    # handler reads as the audio codec and zero frames decode
    single = render_media_mjpeg(9, 2, 1, 1)
    # splice a minimal auds strl ahead of the vids strl inside hdrl
    i = single.find(b"strl")
    assert i > 0
    auds_strh = (b"auds" + b"\x01\x00\x00\x00"
                 + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, 8000,
                               0, 0, 0, 0, 0, 0))
    auds_strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    auds_strl = (b"strl"
                 + b"strh" + struct.pack("<I", len(auds_strh))
                 + auds_strh
                 + b"strf" + struct.pack("<I", len(auds_strf))
                 + auds_strf)
    spliced = (single[:i - 8]
               + b"LIST" + struct.pack("<I", len(auds_strl))
               + auds_strl + single[i - 8:])
    # fix the sizes of the enclosing hdrl LIST and the RIFF header
    grown = 8 + len(auds_strl)
    hd = spliced.find(b"hdrl")
    (hdrl_sz,) = struct.unpack("<I", spliced[hd - 4:hd])
    spliced = (spliced[:hd - 4]
               + struct.pack("<I", hdrl_sz + grown) + spliced[hd:])
    (riff_sz,) = struct.unpack("<I", spliced[4:8])
    spliced = spliced[:4] + struct.pack("<I", riff_sz + grown) \
        + spliced[8:]
    got = decode_avi_frames(spliced)
    assert got is not None
    w, h, frames = got
    assert (w, h, len(frames)) == (8, 8, 2)
    ref = decode_avi_frames(single)
    assert [bytes(f) for f in frames] == [bytes(f) for f in ref[2]]


def test_decoders_reject_header_lie_dims_without_allocating():
    """None-contract hardening (r08 review): a tiny stream whose
    header claims astronomic dims must return None fast — never
    attempt the multi-GB allocation the lie implies (MemoryError is
    not in any decoder's except tuple, by design: it must be
    unreachable). Covers PNG (IHDR lie + deflate bomb), GIF (logical
    screen lie + LZW inflation cap), progressive and baseline JPEG
    (SOF lie before the coefficient-store / plane allocation)."""
    import struct as _s
    import zlib as _z

    from incubator_hugegraph_spark.data.gif import (
        decode_gif_frames, encode_gif_gray)
    from incubator_hugegraph_spark.data.jpeg import (
        encode_jpeg_rgb, encode_jpeg_rgb_progressive)
    from incubator_hugegraph_spark.data.multimodal import (
        _png_chunk, decode_image_rgb, decode_png_rgb)
    # PNG: 2^30 x 1024 claimed in a ~70-byte stream
    ihdr = _s.pack(">IIBBBBB", 1 << 30, 1024, 8, 2, 0, 0, 0)
    tiny = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _z.compress(b"\x00" * 16))
            + _png_chunk(b"IEND", b""))
    assert decode_png_rgb(tiny) is None
    # PNG deflate bomb: sane dims, IDAT inflating way past them
    ihdr2 = _s.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr2)
            + _png_chunk(b"IDAT", _z.compress(b"\x00" * (1 << 22)))
            + _png_chunk(b"IEND", b""))
    assert decode_png_rgb(bomb) is None
    # GIF: 65535x65535 logical screen around one real 1x1 image
    real = encode_gif_gray(b"\x07", 1, 1)
    lied = real[:6] + _s.pack("<HH", 65535, 65535) + real[10:]
    assert decode_gif_frames(lied) is None
    # JPEG: flip a real stream's SOF dims to 65535x65535
    enc = encode_jpeg_rgb(bytes(192), 8, 8)
    prog = encode_jpeg_rgb_progressive(bytes(192), 8, 8)
    for stream, sof in ((enc, b"\xff\xc0"), (prog, b"\xff\xc2")):
        i = stream.find(sof)
        lie = bytearray(stream)
        lie[i + 5:i + 9] = _s.pack(">HH", 65535, 65535)
        assert decode_image_rgb(bytes(lie)) is None


def test_gif_animation_compositing():
    """decode_gif_frames renders animations the way a viewer does
    (r08): full-screen frames round-trip the generator bytes; a
    sub-rectangle patch with a transparent index leaves the
    underlying canvas visible; disposal 2 restores its region to the
    background color before the NEXT frame; disposal 3 is the
    declared None boundary; and frame_dhashes hashes every composited
    frame so animated GIFs ride the same near-dup kernels as AVIs."""
    import struct as _s

    import numpy as np

    from incubator_hugegraph_spark.data.gif import (
        _lzw_compress, _sub_blocks, decode_gif_frames,
        decode_gif_rgb, encode_gif_gray, encode_gif_gray_frames)
    rng = np.random.RandomState(3)
    w, h, nf = 13, 7, 4
    frames = [rng.randint(0, 256, w * h).astype(np.uint8).tobytes()
              for _ in range(nf)]
    enc = encode_gif_gray_frames(frames, w, h)
    got = decode_gif_frames(enc)
    assert got is not None and (got[0], got[1], len(got[2])) \
        == (w, h, nf)
    for f, fr in zip(frames, got[2]):
        assert fr == np.repeat(np.frombuffer(f, np.uint8), 3).tobytes()
    # a single-image GIF is a 1-frame animation; frame 0 == the
    # still-image decode
    single = encode_gif_gray(frames[0], w, h)
    one = decode_gif_frames(single)
    assert len(one[2]) == 1 and one[2][0] == bytes(
        decode_gif_rgb(single)[2])

    def gce(disposal, transparent=None):
        packed = disposal << 2 | (1 if transparent is not None else 0)
        return (b"\x21\xf9\x04" + bytes([packed]) + _s.pack("<H", 4)
                + bytes([transparent or 0]) + b"\x00")

    def sub_image(x, y, sw, sh, idx):
        return (b"\x2c" + _s.pack("<HHHHB", x, y, sw, sh, 0)
                + bytes([8]) + _sub_blocks(_lzw_compress(idx, 8)))

    # frame 2 patches a 2x2 area at (1,1); index 255 is transparent
    base = encode_gif_gray(frames[0], w, h)[:-1]  # strip trailer
    anim = (base + gce(1, transparent=255)
            + sub_image(1, 1, 2, 2, bytes([10, 255, 11, 12]))
            + b"\x3b")
    f0, f1 = decode_gif_frames(anim)[2]
    a0 = np.frombuffer(f0, np.uint8).reshape(h, w, 3)
    a1 = np.frombuffer(f1, np.uint8).reshape(h, w, 3)
    assert (a1[1, 1] == 10).all() and (a1[2, 1] == 11).all() \
        and (a1[2, 2] == 12).all()
    assert (a1[1, 2] == a0[1, 2]).all()      # transparent: untouched
    assert (np.delete(a1.reshape(-1, 3),
                      [1 * w + 1, 1 * w + 2, 2 * w + 1, 2 * w + 2],
                      axis=0)
            == np.delete(a0.reshape(-1, 3),
                         [1 * w + 1, 1 * w + 2, 2 * w + 1, 2 * w + 2],
                         axis=0)).all()
    # disposal 2: the patch region resets to the BACKGROUND (palette
    # entry 0 = black here) before the next frame composites
    anim2 = (base + gce(2) + sub_image(1, 1, 2, 2, bytes([10] * 4))
             + gce(1, transparent=255)
             + sub_image(0, 0, 1, 1, bytes([255]))  # no-op patch
             + b"\x3b")
    fr = decode_gif_frames(anim2)[2]
    assert len(fr) == 3
    a2 = np.frombuffer(fr[2], np.uint8).reshape(h, w, 3)
    assert (a2[1, 1] == 0).all() and (a2[2, 2] == 0).all()
    assert (a2[0, 0] == a0[0, 0]).all()
    # disposal 3 (r09): restore-to-previous — the patch is visible in
    # ITS frame, then the canvas reverts, so a following transparent
    # no-op frame reproduces frame 0 byte-for-byte
    anim3 = (base + gce(3) + sub_image(1, 1, 2, 2, bytes([10] * 4))
             + gce(1, transparent=255)
             + sub_image(0, 0, 1, 1, bytes([255]))
             + b"\x3b")
    fr3 = decode_gif_frames(anim3)[2]
    assert len(fr3) == 3
    b1 = np.frombuffer(fr3[1], np.uint8).reshape(h, w, 3)
    assert (b1[1, 1] == 10).all() and (b1[2, 2] == 10).all()
    assert fr3[2] == fr3[0]
    # the generator path pins the same property: draw, restore, then
    # a full-screen redraw of frame 0 must equal frame 0's snapshot
    anim3b = encode_gif_gray_frames(
        [frames[0], frames[1], frames[0]], w, h, disposals=[1, 3, 1])
    fr3b = decode_gif_frames(anim3b)[2]
    assert fr3b[2] == fr3b[0]
    # reserved disposal values (4..7) stay None
    anim4 = base + gce(4) + sub_image(0, 0, 1, 1, bytes([1])) + b"\x3b"
    assert decode_gif_frames(anim4) is None
    # an out-of-bounds sub-rectangle -> None, not a corrupt canvas
    oob = base + gce(1) + sub_image(w - 1, 0, 2, 1, bytes([1, 2])) \
        + b"\x3b"
    assert decode_gif_frames(oob) is None


def test_gif_cumulative_output_cap():
    """r09 hardening (review): MANY tiny image blocks on a huge
    logical screen must be BOUNDED during the PARSE walk — each
    block snapshots the full canvas, so forty 1x1 blocks on a
    2048x2048 screen would decode to ~500 MB without a cumulative
    budget (the per-frame dims check cannot see this: every frame
    is individually tiny). Past the budget the animation TRUNCATES
    (third review wave: ordinary long animations keep their
    in-budget frames instead of regressing to None)."""
    import struct as _s

    from incubator_hugegraph_spark.data.gif import (
        MAX_TOTAL_PIXELS, _lzw_compress, _sub_blocks,
        decode_gif_frames, encode_gif_gray, encode_gif_gray_frames)

    def sub_image(x, y, sw, sh, idx):
        return (b"\x2c" + _s.pack("<HHHHB", x, y, sw, sh, 0)
                + bytes([8]) + _sub_blocks(_lzw_compress(idx, 8)))

    lsd = _s.pack("<HHBBB", 2048, 2048, 0x80 | 0x07, 0, 0)
    evil = (b"GIF89a" + lsd + bytes(768)
            + b"".join(sub_image(0, 0, 1, 1, bytes([0]))
                       for _ in range(40))
            + b"\x3b")
    assert len(evil) < 2048  # the ~500 MB-from-sub-KB attack shape
    got = decode_gif_frames(evil)
    assert got is not None and len(got[2]) < 40
    assert len(got[2]) * 2048 * 2048 <= MAX_TOTAL_PIXELS
    # a long MODERATE animation keeps its in-budget frame prefix
    # (frames are full-screen here, so each charges 2*w*h)
    frames40 = [bytes([f]) * (400 * 300) for f in range(40)]
    mod = decode_gif_frames(
        encode_gif_gray_frames(frames40, 400, 300))
    keep = MAX_TOTAL_PIXELS // (2 * 400 * 300)
    assert mod is not None and len(mod[2]) == min(40, keep)
    for f, fr in zip(frames40, mod[2]):
        assert fr[:3] == bytes([f[0]]) * 3  # prefix frames intact
    # a max-size STILL stays inside the envelope (budget = 2x
    # MAX_PIXELS covers one w*h == sw*sh == MAX_PIXELS block) —
    # assert on the budget arithmetic, not a 50 MB decode
    assert 2 * 4096 * 4096 <= MAX_TOTAL_PIXELS
    # legitimate small animations are nowhere near the cap
    frames = [bytes(16 * 16) for _ in range(8)]
    got = decode_gif_frames(encode_gif_gray_frames(frames, 16, 16))
    assert got is not None and len(got[2]) == 8
    # and a single large-screen frame still decodes (per-frame path)
    big = encode_gif_gray(bytes(512 * 512), 512, 512)
    assert decode_gif_frames(big) is not None
    # STILL path (r09 review wave 2): decode_gif_rgb never allocates
    # the screen canvas, so a large DECLARED logical screen must not
    # reject a small first image there (the budget charges sw*sh on
    # the animation walk only)
    from incubator_hugegraph_spark.data.multimodal import \
        decode_image_rgb
    small = encode_gif_gray(bytes(range(100)) * 100, 100, 100)
    wide = bytearray(small)
    wide[6:10] = _s.pack("<HH", 8192, 8192)  # lie the screen only
    got_still = decode_image_rgb(bytes(wide))
    assert got_still is not None and got_still[0] == 100


def test_jpeg_progressive_eobrun_spanning_blocks():
    """EOBn with n>=1 — an end-of-band run SPANNING blocks — can't be
    produced by our encoder (Annex K tables carry no EOBn>0 symbols,
    so it ends every block with EOB0), yet real progressive encoders
    emit it constantly; this hand-crafted stream pins the decoder's
    cross-block eobrun bookkeeping. Grayscale 32x8 (4 blocks), custom
    AC table {0x01:'0', 0x00:'10', 0x10:'11'}: block0 codes AC[1]=+1
    then EOB1+bit1 (run of 2 → blocks 1-2 all-zero bands), block3
    closes itself with EOB0. Expected pixels recomputed from the
    coefficients through the orthonormal IDCT."""
    import struct as _s

    import numpy as np

    from incubator_hugegraph_spark.data.jpeg import (
        STD_DC_LUMA, ZIGZAG, _BitWriter, _build_huffman_codes,
        _dct_matrix, _dht_segment, _dqt_segment, decode_jpeg_rgb)
    ac_bits = [1, 2] + [0] * 14
    ac_vals = [0x01, 0x00, 0x10]
    ac = _build_huffman_codes(ac_bits, ac_vals)
    dc = _build_huffman_codes(*STD_DC_LUMA)

    def sos(ss, se, ah, al):
        body = bytes([1, 1, 0x00, ss, se, ah << 4 | al])
        return b"\xff\xda" + _s.pack(">H", 2 + len(body)) + body

    # DC scan: diffs 8,8,8,8 (category 4)
    w = _BitWriter()
    for _ in range(4):
        code, length = dc[4]
        w.write(code, length)
        w.write(8, 4)
    w.flush()
    dc_scan = sos(0, 0, 0, 0) + bytes(w.out)
    # AC scan: block0 = (r0,s1)+sign1 at k=1, then EOB1 + extra bit 1
    # (eobrun covers blocks 1 and 2); block3 = EOB0
    w = _BitWriter()
    code, length = ac[0x01]
    w.write(code, length)
    w.write(1, 1)           # +1
    code, length = ac[0x10]
    w.write(code, length)   # EOB1
    w.write(1, 1)           # extra bit -> run = 2
    code, length = ac[0x00]
    w.write(code, length)   # EOB0 for block3
    w.flush()
    ac_scan = sos(1, 63, 0, 0) + bytes(w.out)

    sof = (b"\xff\xc2" + _s.pack(">HBHHB", 8 + 3, 8, 8, 32, 1)
           + bytes([1, 0x11, 0]))
    stream = (b"\xff\xd8" + _dqt_segment(0, [1] * 64) + sof
              + _dht_segment(0, 0, *STD_DC_LUMA)
              + _dht_segment(1, 0, ac_bits, ac_vals)
              + dc_scan + ac_scan + b"\xff\xd9")
    got = decode_jpeg_rgb(stream)
    assert got is not None
    gw, gh, out = got
    assert (gw, gh) == (32, 8)
    # expected: per-block coefficients through the orthonormal IDCT
    a = _dct_matrix()
    img = np.zeros((8, 32), dtype=np.uint8)
    for blk, dcv in enumerate([8, 16, 24, 32]):
        coef = np.zeros(64)
        coef[ZIGZAG[0]] = dcv
        if blk == 0:
            coef[ZIGZAG[1]] = 1
        block = a.T @ coef.reshape(8, 8) @ a
        img[:, blk * 8:(blk + 1) * 8] = np.clip(
            np.rint(block) + 128, 0, 255).astype(np.uint8)
    want = np.repeat(img.reshape(8, 32, 1), 3, axis=2).tobytes()
    assert bytes(out) == want


def test_jpeg_progressive_hardening_r09():
    """r09 review hardening: (a) a SOF2 stream lying its dims to just
    under the BASELINE pixel cap maps to None — progressive has its
    own tighter MAX_PROG_PIXELS because the int32 coefficient store
    costs ~12 bytes/px and would otherwise pin ~200 MB per asset off
    a ~30-byte prefix; (b) a hostile DHT whose DC table carries a
    magnitude category > 11 (T.81 Table F.1 caps 8-bit DC categories
    at 11) rejects as None instead of reading up to 255 raw bits
    whose value overflows the int32 store (OverflowError on
    numpy >= 2, silent wraparound on 1.x)."""
    import struct as _s

    from incubator_hugegraph_spark.data.jpeg import (
        MAX_PIXELS, MAX_PROG_PIXELS, _BitWriter, _dht_segment,
        _dqt_segment, decode_jpeg_rgb, encode_jpeg_rgb_progressive)
    # (a) tighter progressive cap: 4000x4000 = 16M px passes the
    # baseline MAX_PIXELS check but not MAX_PROG_PIXELS
    assert MAX_PROG_PIXELS < 4000 * 4000 <= MAX_PIXELS
    prog = encode_jpeg_rgb_progressive(bytes(192), 8, 8)
    i = prog.find(b"\xff\xc2")
    lie = bytearray(prog)
    lie[i + 5:i + 9] = _s.pack(">HH", 4000, 4000)
    assert decode_jpeg_rgb(bytes(lie)) is None
    # (b) DC category 16 selected by a single-entry hostile DC table
    dc_bits = [1] + [0] * 15
    dc_vals = [16]
    sof = (b"\xff\xc2" + _s.pack(">HBHHB", 8 + 3, 8, 8, 8, 1)
           + bytes([1, 0x11, 0]))
    sos = b"\xff\xda" + _s.pack(">H", 8) + bytes([1, 1, 0x00, 0, 0, 0])
    w = _BitWriter()
    w.write(0, 1)         # the lone code -> symbol 16
    w.write(0xFFFF, 16)   # 16 magnitude bits the decoder must refuse
    w.flush()
    evil = (b"\xff\xd8" + _dqt_segment(0, [1] * 64) + sof
            + _dht_segment(0, 0, dc_bits, dc_vals)
            + sos + bytes(w.out) + b"\xff\xd9")
    assert decode_jpeg_rgb(evil) is None
    # (c) REPEATED SOF headers (r09 review wave 2): comps grows per
    # SOF segment and sizes the lazy progressive store, so K headers
    # near the cap would request K x ~50 MB at the first scan; one
    # frame header per stream (T.81 B.2.2), extras map to None
    big_sof = (b"\xff\xc2" + _s.pack(">HBHHB", 8 + 3 * 3, 8,
                                     2048, 2048, 3)
               + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0])
               + bytes([3, 0x11, 0]))
    multi = (b"\xff\xd8" + _dqt_segment(0, [1] * 64)
             + big_sof * 40 + sos + b"\x00" + b"\xff\xd9")
    assert decode_jpeg_rgb(multi) is None


def test_decode_media_dataframe_and_resize(docs):
    """End-to-end through Spark: media_docs_as_assets → decode_media
    stats match a local recompute for a sample; resize_images_real
    re-encodes genuinely smaller PNGs whose decoded pixels equal the
    floor-mapped NN subsample."""
    import math

    import numpy as np

    from incubator_hugegraph_spark.data.multimodal import (
        decode_media, decode_png_rgb, media_docs_as_assets,
        resize_images_real, synth_media_bytes, synth_media_samples)
    assets = media_docs_as_assets(docs)
    stats = {r.asset_id: r
             for r in decode_media(assets).orderBy("asset_id")
             .limit(9).collect()}
    texts = {r.doc_id: len(r.text.encode())
             for r in docs.orderBy("doc_id").limit(9).collect()}
    for aid, r in stats.items():
        n = texts[aid]
        if r.modality == "image":
            w = max(1, math.isqrt(n))
            hh = max(1, -(-n // w))
            vals = synth_media_bytes(aid, w * hh * 3).astype(np.int64)
            assert (r.width, r.height, r.n_frames) == (w, hh, None)
        elif r.modality == "audio":
            vals = synth_media_samples(aid, max(1, n)).astype(np.int64)
            assert (r.width, r.height, r.n_frames) == (None, None, None)
        else:
            fr = max(1, n // 100)
            vals = np.concatenate(
                [synth_media_bytes(aid, 768, offset=f * 769)
                 for f in range(fr)]).astype(np.int64)
            assert (r.width, r.height, r.n_frames) == (16, 16, fr)
        assert r.n_values == vals.size
        assert r.val_sum == int(vals.sum())
        assert r.val_sumsq == int((vals * vals).sum())
        assert (r.val_min, r.val_max) == (int(vals.min()), int(vals.max()))
    # real resize: every image asset lands within max_side and its
    # payload re-decodes to the NN subsample of the original pixels
    imgs = assets.filter(F.col("modality") == "image")
    one = resize_images_real(imgs, 7).orderBy("asset_id").first()
    w2, h2, raw2 = decode_png_rgb(bytes(one.payload))
    assert max(w2, h2) <= 7
    n = texts[one.asset_id]
    w = max(1, math.isqrt(n))
    h = max(1, -(-n // w))
    img = synth_media_bytes(one.asset_id, w * h * 3).reshape(h, w, 3)
    ys = (np.arange(h2, dtype=np.int64) * h) // h2
    xs = (np.arange(w2, dtype=np.int64) * w) // w2
    assert bytes(raw2) == img[np.ix_(ys, xs)].tobytes()


# ----------------------------------------------------------------- events

def test_sessionize_gap_semantics(spark):
    from incubator_hugegraph_spark.streaming.events import sessionize
    rows = [
        (1, "2024-01-01 00:00:00", 100),
        (1, "2024-01-01 00:10:00", 101),   # same session (10 min)
        (1, "2024-01-01 00:50:00", 102),   # new session (40 min gap)
        (2, "2024-01-01 00:00:00", 200),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, event_id long") \
        .withColumn("ts", F.to_timestamp("ts"))
    got = sessionize(df).orderBy("user_id", "session_id").collect()
    assert [(r.user_id, r.session_id, r.n_events) for r in got] == \
        [(1, 1, 2), (1, 2, 1), (2, 1, 1)]


def test_stream_window_agg_matches_batch(spark, tmp_path):
    """The streaming windowed agg (availableNow) must equal the batch
    form on the same input."""
    from incubator_hugegraph_spark.streaming.events import (
        stream_window_agg, window_agg)
    from incubator_hugegraph_spark.sources.tpch import read_table
    events = read_table(spark, SF_DIR, "events")
    batch = window_agg(events)
    stream = stream_window_agg(spark, f"{SF_DIR}/events.parquet")
    q = (stream.writeStream.format("memory").queryName("wagg")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT event_type, window.start AS window_start, n_events "
        "FROM wagg")
    want = batch.select("event_type", "window_start", "n_events")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_stream_events_to_edges(spark, tmp_path):
    """Cross-batch stateful ingestion: the input is split into two
    files streamed one per micro-batch (maxFilesPerTrigger=1), so the
    first event of batch 2 must pair with the last event of batch 1 —
    the streamed edge set equals the batch lag-window derivation."""
    from incubator_hugegraph_spark.streaming.events import (
        stream_events_to_edges)
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src_dir = str(tmp_path / "events_split")
    # two files, split by ts order so both batches hold every key
    events.orderBy("ts", "event_id").coalesce(1).limit(5000) \
        .write.parquet(src_dir)
    events.orderBy("ts", "event_id").coalesce(1).offset(5000) \
        .write.mode("append").parquet(src_dir)
    out = str(tmp_path / "edges_out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_events_to_edges(spark, src_dir, ckpt, out,
                               max_files_per_trigger=1)
    q.awaitTermination(180)
    from incubator_hugegraph_spark.streaming.events import (
        read_streamed_edges)
    got = read_streamed_edges(spark, out)
    assert got.columns == ["src", "dst", "label", "sort_values"]
    # batch derivation over the SAME (re-written) input
    from incubator_hugegraph_spark.functions.ids import splice_id_col
    from pyspark.sql.window import Window as W
    ev = spark.read.parquet(src_dir)
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    want = (ev.withColumn("pu", F.lag("user_id").over(w))
            .filter(F.col("pu").isNotNull()
                    & (F.col("pu") != F.col("user_id")))
            .select(splice_id_col("customer", "pu").alias("src"),
                    splice_id_col("customer", "user_id").alias("dst"),
                    F.lit("interacted").alias("label"),
                    F.col("event_id").cast("string").alias("sort_values")))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_stream_sessionize_matches_batch(spark):
    """The applyInPandasWithState sessionizer (availableNow) must equal
    the batch window-function sessionizer on the same input."""
    from incubator_hugegraph_spark.streaming.events import (
        run_stream_sessionize, sessionize)
    from incubator_hugegraph_spark.sources.tpch import read_table
    events = read_table(spark, SF_DIR, "events")
    want = sessionize(events)
    got = run_stream_sessionize(spark, f"{SF_DIR}/events.parquet",
                                name="sss_test")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_embedding_neardup_subset_of_bruteforce(spark):
    """Every LSH-verified near-dup pair must appear in the brute-force
    pair set with the same cosine, and catch all pairs >= 0.45 (the
    4-plane x 24-table structure has near-full recall there)."""
    from incubator_hugegraph_spark.data.dedup import embedding_neardup_pairs
    from incubator_hugegraph_spark.data.similarity import _to_double, cosine
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = embedding_neardup_pairs(emb, threshold=0.4)
    e = emb.select(F.col("vec_id").alias("id"),
                   _to_double("embedding").alias("v"))
    a = e.select(F.col("id").alias("d1"), F.col("v").alias("v1"))
    b = e.select(F.col("id").alias("d2"), F.col("v").alias("v2"))
    brute = (a.crossJoin(b).filter(F.col("d1") < F.col("d2"))
             .withColumn("sim", cosine(F.col("v1"), F.col("v2")))
             .filter(F.col("sim") >= 0.4)
             .select("d1", "d2", F.round("sim", 6).alias("sim")))
    assert got.exceptAll(brute).count() == 0
    missed = (brute.filter(F.col("sim") >= 0.45)
              .join(got, on=["d1", "d2"], how="left_anti"))
    assert missed.count() == 0


def test_stream_watermark_gates_emission_and_eviction(spark, tmp_path):
    """The append-mode watermark contract: a window is emitted exactly
    once, with its final count, once the watermark passes its end —
    and windows the watermark has NOT passed are withheld (still in
    state), with state evicted down to just those. Two micro-batches
    (time-split files) drive the watermark from 0 to max_ts - 2h."""
    from incubator_hugegraph_spark.sources.tpch import read_table
    from incubator_hugegraph_spark.streaming.events import (
        _read_stream, window_agg)
    events = read_table(spark, SF_DIR, "events")
    split = "2024-01-15"
    src_dir = str(tmp_path / "ev")
    # older half first (batch 1), newer half second (batch 2) — the
    # watermark only advances after the first batch completes
    events.filter(F.col("ts") < split).coalesce(1).write.parquet(src_dir)
    import time
    time.sleep(1.5)
    events.filter(F.col("ts") >= split).coalesce(1) \
        .write.mode("append").parquet(src_dir)
    stream = _read_stream(spark, src_dir, max_files_per_trigger=1)
    agg = (stream.withWatermark("ts", "2 hours")
           .groupBy("event_type", F.window("ts", "1 hour"))
           .agg(F.count(F.lit(1)).alias("n_events")))
    q = (agg.select("event_type",
                    F.col("window").getField("start").alias("window_start"),
                    "n_events")
         .writeStream.format("memory").queryName("wm_gate")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.table("wm_gate")
    want = window_agg(events).select("event_type", "window_start",
                                     "n_events")
    import datetime
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - datetime.timedelta(hours=2)
    emitted_expected = want.filter(
        (F.col("window_start") + F.expr("INTERVAL 1 HOUR")) <= F.lit(wm))
    # every due window emitted exactly once with the final batch count
    assert got.count() == emitted_expected.count()
    assert got.exceptAll(emitted_expected).count() == 0
    # windows not yet passed by the watermark are withheld
    withheld = want.exceptAll(got)
    assert withheld.filter(
        (F.col("window_start") + F.expr("INTERVAL 1 HOUR"))
        <= F.lit(wm)).count() == 0


# --------------------------------------------------------- corpus hygiene

def test_decontaminate_overlap_semantics(spark):
    from incubator_hugegraph_spark.data.clean import decontaminate
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "one two three four five"),
         (3, "alpha beta gamma zeta")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "x alpha beta gamma y"),      # 3 3-grams, 1 shared
         (101, "six seven eight")],
        "doc_id long, text string")
    rows = {(r.train_id, r.bench_id): (r.overlap, r.overlap_frac)
            for r in decontaminate(train, bench, n=3,
                                   min_overlap=1).collect()}
    # docs 1 and 3 both contain the 'alpha beta gamma' shingle of 100
    assert rows == {(1, 100): (1, round(1 / 3, 6)),
                    (3, 100): (1, round(1 / 3, 6))}


def test_decontaminate_hot_shingle_drop(spark):
    from incubator_hugegraph_spark.data.clean import decontaminate
    # 'a b c' appears in every train doc -> dropped at max_doc_frac=0.5
    train = spark.createDataFrame(
        [(i, "a b c filler%d" % i) for i in range(4)],
        "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    assert decontaminate(train, bench, n=3, min_overlap=1,
                         max_doc_frac=0.5).count() == 0
    assert decontaminate(train, bench, n=3, min_overlap=1).count() == 4


def test_dup_ngram_ratio_bounds_and_short_docs(spark, docs):
    from incubator_hugegraph_spark.data.clean import dup_ngram_ratio
    out = dup_ngram_ratio(docs, n=3)
    assert out.count() == docs.count()
    bad = out.filter((F.col("dup_ratio") < 0) | (F.col("dup_ratio") > 1)
                     | (F.col("n_dup") > F.col("n_ngrams"))).count()
    assert bad == 0
    short = spark.createDataFrame([(1, "two words")],
                                  "doc_id long, text string")
    r = dup_ngram_ratio(short, n=3).collect()[0]
    assert (r.n_ngrams, r.n_dup, r.dup_ratio) == (0, 0, 0.0)


def test_stream_dedup_drops_redelivered_events(spark, tmp_path):
    """At-least-once feed: the full event file is delivered twice in
    separate micro-batches; the deduped stream equals one copy."""
    from incubator_hugegraph_spark.streaming.events import stream_dedup
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src_dir = str(tmp_path / "events_dup")
    events.coalesce(1).write.parquet(src_dir)
    events.coalesce(1).write.mode("append").parquet(src_dir)
    q = stream_dedup(spark, src_dir, str(tmp_path / "ckpt"),
                     str(tmp_path / "out"), max_files_per_trigger=1)
    q.awaitTermination(180)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_ivf_kmeans_refinement_recall(emb):
    """Lloyd's-refined IVF must not lose recall vs seed centroids on
    the same probe budget (same deterministic tie-breaks)."""
    from incubator_hugegraph_spark.data.similarity import (
        cosine_topk, ivf_topk)
    qids = list(range(5))
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, qids, 10).collect()}

    def recall(n_iters):
        got = {(r.query_id, r.neighbor_id)
               for r in ivf_topk(emb, qids, 10, n_cells=8, n_probe=4,
                                 n_iters=n_iters).collect()}
        return len(got & exact) / len(exact)

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0 - 0.1  # refinement must not collapse recall
    assert r2 >= 0.5


def test_hash_split_deterministic_and_total(spark, docs):
    from incubator_hugegraph_spark.data.sample import hash_split
    s = hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    a = {r.doc_id: r.split for r in s.collect()}
    b = {r.doc_id: r.split
         for r in hash_split(docs.repartition(7),
                             {"train": 0.9, "val": 0.05,
                              "test": 0.05}).collect()}
    assert a == b  # partitioning-independent
    assert set(a.values()) <= {"train", "val", "test"}
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.8 < frac < 0.97


def test_stratified_sample_quota_and_stability(spark, docs):
    from incubator_hugegraph_spark.data.sample import stratified_sample
    s = stratified_sample(docs, "lang", 5)
    per = {r.lang: r.n for r in
           s.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r.lang: r.n for r in
             docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    for lang, n in per.items():
        assert n == min(5, sizes[lang])
    again = stratified_sample(docs.repartition(5), "lang", 5)
    assert {(r.doc_id, r.lang) for r in s.collect()} == \
        {(r.doc_id, r.lang) for r in again.collect()}


def test_repetition_metrics_known_values(spark):
    from incubator_hugegraph_spark.data.clean import repetition_metrics
    d = spark.createDataFrame(
        [(1, "a b a b a"),      # 2-grams: ab ba ab ba -> top 2/4, dup 4/4
         (2, "x y z w"),        # xy yz zw all unique -> top 1/3, dup 0
         (3, "q"),              # shorter than n -> zeros
         (4, "")],
        "doc_id long, text string")
    got = {r.id: r for r in repetition_metrics(d, n=2).collect()}
    assert got[1].n_ngrams == 4
    assert got[1].top_ngram_frac == 0.5
    assert got[1].dup_ngram_frac == 1.0
    assert got[2].n_ngrams == 3
    assert abs(got[2].top_ngram_frac - round(1 / 3, 6)) < 1e-12
    assert got[2].dup_ngram_frac == 0.0
    assert got[3].n_ngrams == 0 and got[3].top_ngram_frac == 0.0
    assert got[4].n_ngrams == 0 and got[4].dup_ngram_frac == 0.0


def test_kmeans_cluster_stats_partition_and_determinism(emb):
    from incubator_hugegraph_spark.data.similarity import (
        kmeans_cluster_stats)
    s1 = kmeans_cluster_stats(emb, n_cells=6, n_iters=1)
    rows = s1.collect()
    # every vector lands in exactly one cluster
    assert sum(r.size for r in rows) == emb.count()
    assert len(rows) <= 6
    assert all(-1.0 <= r.mean_sim <= 1.0 for r in rows)
    # deterministic build: a second run is row-identical
    s2 = {r.cell: (r.size, r.mean_sim)
          for r in kmeans_cluster_stats(emb, n_cells=6, n_iters=1).collect()}
    assert {r.cell: (r.size, r.mean_sim) for r in rows} == s2


def test_pii_redact_patterns_and_counts(spark):
    from incubator_hugegraph_spark.data.clean import pii_redact
    d = spark.createDataFrame(
        [(1, "mail me at jane.doe+x@example.co.uk or call +1 (415) 555-0199"),
         (2, "server 10.0.255.7 ssn 123-45-6789"),
         (3, "nothing sensitive here"),
         (4, "two mails: a@b.io c@d.org")],
        "doc_id long, text string")
    got = {r.id: r for r in pii_redact(d).collect()}
    assert got[1].n_email == 1 and got[1].n_phone == 1
    assert "<EMAIL>" in got[1].redacted and "<PHONE>" in got[1].redacted
    assert "jane" not in got[1].redacted and "555" not in got[1].redacted
    assert got[2].n_ipv4 == 1 and got[2].n_ssn == 1
    assert "<IPV4>" in got[2].redacted and "<SSN>" in got[2].redacted
    assert got[3].redacted == "nothing sensitive here"
    assert got[3].n_email == got[3].n_phone == 0
    assert got[4].n_email == 2 and got[4].redacted.count("<EMAIL>") == 2


def test_rest_cypher_adapter(graph):
    from incubator_hugegraph_spark import rest
    df = rest.execute_cypher(
        graph, {"cypher": "MATCH (r:region) RETURN count(*) AS n"})
    assert df.head().n == 5
    df2 = rest.execute_cypher(graph,
                              "MATCH (n:nation) RETURN count(*) AS n")
    assert df2.head().n == 25


def test_cosine_topk_np_equals_column_kernel(emb):
    from incubator_hugegraph_spark.data.similarity import (cosine_topk,
                                                           cosine_topk_np)
    a = cosine_topk(emb, [0, 1, 2], 7).withColumnRenamed("sim", "s1")
    b = cosine_topk_np(emb, [0, 1, 2], 7).withColumnRenamed("sim", "s2")
    j = a.join(b, on=["query_id", "neighbor_id"], how="full")
    assert j.filter(F.coalesce("s1", F.lit(-2.0))
                    != F.coalesce("s2", F.lit(-3.0))).count() == 0


def test_pack_sequences_two_phase_equals_naive(spark, docs):
    """The two-phase prefix sum must equal the naive global-window
    cumsum regardless of bucket size, and offsets stay < seq_len."""
    from incubator_hugegraph_spark.data.sample import pack_sequences
    from incubator_hugegraph_spark.functions.text import token_count
    from pyspark.sql.window import Window
    naive = (docs.select(F.col("doc_id").alias("id"),
                         token_count(F.col("text")).alias("n"))
             .withColumn("start", F.coalesce(
                 F.sum("n").over(
                     Window.orderBy("id").rowsBetween(
                         Window.unboundedPreceding, -1)), F.lit(0))))
    expect = {r.id: (r.start // 100, r.start % 100)
              for r in naive.collect()}
    for nb in (7, 64, 10_000):
        got = pack_sequences(docs, seq_len=100, n_buckets=nb)
        rows = got.collect()
        assert all(0 <= r.offset < 100 for r in rows)
        assert {r.id: (r.seq_id, r.offset) for r in rows} == expect, nb


def test_incremental_wcc_equals_batch_fixpoint(spark, tmp_path, graph):
    """Folding the edge list through incremental_wcc_batch in
    arbitrary micro-batch splits must equal algorithms/wcc's
    fixpoint exactly (component = min reachable id)."""
    from incubator_hugegraph_spark.algorithms.wcc import wcc
    from incubator_hugegraph_spark.streaming.incremental import (
        incremental_wcc_batch, incremental_wcc_stream)
    edges = (graph.adj("OUT", ["interacted"])
             .select("src", "dst").distinct())
    want = {r.id: r.component
            for r in wcc(graph, labels=["interacted"]).collect()
            if r.id.startswith("customer!")}
    # batch-fold in 3 uneven chunks (deterministic split on src hash)
    state = None
    for k in range(3):
        chunk = edges.filter(F.abs(F.hash("src")) % 3 == k)
        state = incremental_wcc_batch(state, chunk)
    got = {r.id: r.component for r in state.collect()}
    # wcc covers all graph vertices; restrict to those touched by
    # interacted edges
    assert got == {k: v for k, v in want.items() if k in got}
    assert len(got) > 0
    # streaming driver: same edges via availableNow file stream
    epath = str(tmp_path / "edges")
    edges.repartition(4).write.parquet(epath)
    q, get_state = incremental_wcc_stream(
        spark, epath, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination(120)
    sgot = {r.id: r.component for r in get_state().collect()}
    assert sgot == got


def test_incremental_wcc_big_batch_tier_equals_driver_tier(
        spark, graph, monkeypatch):
    """r10: past WCC_DRIVER_FOLD_EDGES the fold keeps the pair
    computation distributed instead of collecting the edge list.
    Forcing the big-batch tier (gate monkeypatched to 0) must yield
    exactly the driver tier's fold across the same uneven chunks."""
    import incubator_hugegraph_spark.streaming.incremental as inc

    edges = (graph.adj("OUT", ["interacted"])
             .select("src", "dst").distinct())

    def fold_all():
        state = None
        for k in range(3):
            chunk = edges.filter(F.abs(F.hash("src")) % 3 == k)
            state = inc.incremental_wcc_batch(state, chunk)
        return {(r.id, r.component) for r in state.collect()}

    want = fold_all()  # driver tier (default gate)
    monkeypatch.setattr(inc, "WCC_DRIVER_FOLD_EDGES", 0)
    assert fold_all() == want
    assert len(want) > 0


def test_incremental_wcc_stream_restart_resumes_state(spark, tmp_path,
                                                      graph):
    """Streaming review r06: a restarted query SKIPS batches the
    durable checkpoint committed — the fold state must be durable
    too. Simulate a crash-restart: run the stream over the first
    files, then START A NEW DRIVER with the SAME checkpoint after
    more files arrive; the resumed state must cover the pre-restart
    edges (memory-only state silently lost them)."""
    from incubator_hugegraph_spark.streaming.incremental import (
        incremental_wcc_batch, incremental_wcc_stream)
    edges = (graph.adj("OUT", ["interacted"])
             .select("src", "dst").distinct())
    a = edges.filter(F.abs(F.hash("src")) % 2 == 0)
    b = edges.filter(F.abs(F.hash("src")) % 2 == 1)
    epath = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")
    a.coalesce(1).write.parquet(epath)
    q1, gs1 = incremental_wcc_stream(spark, epath, ckpt,
                                     max_files_per_trigger=1)
    q1.awaitTermination(120)
    n_first = gs1().count()
    assert n_first > 0
    # "crash": q1's driver-held state is gone; more data arrives
    b.coalesce(1).write.mode("append").parquet(epath)
    q2, gs2 = incremental_wcc_stream(spark, epath, ckpt,
                                     max_files_per_trigger=1)
    q2.awaitTermination(120)
    got = {r.id: r.component for r in gs2().collect()}
    # ground truth: one fold over ALL edges
    want = {r.id: r.component
            for r in incremental_wcc_batch(None, edges).collect()}
    assert got == want  # pre-restart edges included, not just batch b


def test_stream_edges_sink_replay_idempotent(spark, tmp_path):
    """The foreachBatch edge sink writes one overwritten directory
    per micro-batch — re-executing a batch (crash-before-offset-
    commit replay) must not duplicate edges."""
    from incubator_hugegraph_spark.streaming.events import (
        read_streamed_edges, stream_events_to_edges)
    events = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .orderBy("ts", "event_id").limit(2000).coalesce(1)
    src_dir = str(tmp_path / "ev")
    events.write.parquet(src_dir)
    out = str(tmp_path / "out")
    q = stream_events_to_edges(spark, src_dir, str(tmp_path / "ck1"),
                               out)
    q.awaitTermination(120)
    n1 = read_streamed_edges(spark, out).count()
    # replay the SAME input with a FRESH checkpoint into the SAME
    # out_dir — batch ids repeat, directories overwrite, count stable
    q = stream_events_to_edges(spark, src_dir, str(tmp_path / "ck2"),
                               out)
    q.awaitTermination(120)
    n2 = read_streamed_edges(spark, out).count()
    assert n1 == n2 > 0


def test_duplicated_spans_coverage(spark):
    """Hand-built corpus: the 3-gram 'a b c' is shared by docs 1 and
    2; doc 3 shares nothing."""
    from incubator_hugegraph_spark.data.clean import duplicated_spans
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x a b c y"), (3, "p q r s t"),
         (4, "")],
        "doc_id long, text string")
    rows = {r.id: r for r in duplicated_spans(docs, n=3).collect()}
    # doc 1: 'a b c' duplicated at pos 0 -> covers tokens a,b,c (3/5)
    assert (rows[1].dup_spans, rows[1].covered_tokens) == (1, 3)
    assert rows[1].dup_token_frac == 0.6
    # doc 2: 'a b c' at pos 1 -> covers a,b,c (3/5)
    assert (rows[2].dup_spans, rows[2].covered_tokens) == (1, 3)
    # doc 3: clean; doc 4: empty
    assert rows[3].dup_token_frac == 0.0
    assert (rows[4].n_tokens, rows[4].dup_token_frac) == (0, 0.0)


def test_incremental_neardup_equals_batch(spark):
    """Batch-equivalence invariant: folding the corpus in ANY
    micro-batch partitioning yields exactly minhash_lsh_pairs."""
    from incubator_hugegraph_spark.data.dedup import minhash_lsh_pairs
    from incubator_hugegraph_spark.streaming.incremental import (
        incremental_neardup_batch)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    want = {(r.d1, r.d2, r.jaccard) for r in
            minhash_lsh_pairs(docs, n=3, threshold=0.3).collect()}
    state, got = None, set()
    for r in (0, 1):
        batch = docs.filter(F.col("doc_id") % 2 == r)
        state, pairs = incremental_neardup_batch(
            state, batch, docs, n=3, threshold=0.3)
        got |= {(r.d1, r.d2, r.jaccard) for r in pairs.collect()}
    assert got == want and want
    # state holds one band row set per doc seen
    n_docs = docs.count()
    assert state.select("id").distinct().count() == n_docs


def test_incremental_neardup_broadcasts_batch(spark):
    """The candidate join must broadcast the O(batch) band table
    (BuildLeft), never the O(corpus) state."""
    from incubator_hugegraph_spark.data.dedup import (
        band_rows, minhash_signatures)
    from pyspark.sql import functions as SF
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    state = band_rows(minhash_signatures(docs, 3))
    batch = band_rows(minhash_signatures(docs.limit(5), 3))
    new = batch.select(SF.col("id").alias("dn"), "band", "bucket")
    cand = (SF.broadcast(new)
            .join(state.unionByName(batch).withColumnRenamed("id", "do"),
                  on=["band", "bucket"])
            .filter(SF.col("do") != SF.col("dn")))
    plan = cand._jdf.queryExecution().executedPlan().toString()
    joins = [l for l in plan.splitlines()
             if "BroadcastHashJoin" in l and "band" in l]
    assert joins and all("BuildLeft" in l for l in joins), plan


def test_count_min_heavy_hitters(spark):
    """With 5 keys vs 1024 buckets, collisions are absent — estimates
    equal exact counts; with w=4 they are upper bounds (never
    under)."""
    from incubator_hugegraph_spark.data.sketch import (
        cm_estimate, count_min, heavy_hitters)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {r.event_type: r.c for r in
             ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
             .collect()}
    hh = {r.key: r.est for r in
          heavy_hitters(ev, "event_type", 0.05).collect()}
    assert hh == exact
    # collision regime: estimates are upper bounds
    cms = count_min(ev, "event_type", d=2, w=4)
    est = {r.key: r.est for r in
           cm_estimate(cms, ev.select("event_type").distinct(),
                       "event_type", d=2, w=4).collect()}
    assert all(est[k] >= exact[k] for k in exact)
    # the sketch itself never exceeds d*w rows
    assert cms.count() <= 2 * 4


def test_kmv_distinct_estimate(spark):
    from incubator_hugegraph_spark.data.sketch import kmv_distinct
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    true_d = ev.select("user_id").distinct().count()
    row = kmv_distinct(ev, "user_id", k=64).head()
    # standard KMV error ~ 1/sqrt(k) ≈ 12.5% at k=64; allow 3 sigma
    assert abs(row.distinct_est - true_d) / true_d < 0.4
    # below-k regime is exact
    small = ev.limit(30)
    d_small = small.select("user_id").distinct().count()
    row2 = kmv_distinct(small, "user_id", k=256).head()
    assert row2.distinct_est == float(d_small) == float(row2.k_used)


# ---- round 4: Gopher rules / domain mixing ----------------------------


def test_gopher_rules_metrics(docs, spark):
    from incubator_hugegraph_spark.data.clean import gopher_rules
    out = gopher_rules(docs, stop_words=("the", "a"), min_stop=2)
    row = out.orderBy("doc_id").head()
    doc = docs.orderBy("doc_id").head()
    words = [w for w in doc.text.split() if w]
    assert row.n_words == len(words)
    assert abs(row.mean_word_len
               - sum(len(w) for w in words) / len(words)) < 1e-6
    assert row.r_word_count == (50 <= len(words) <= 100_000)
    hits = {w.lower() for w in words} & {"the", "a"}
    assert row.stop_hits == len(hits)
    # keep is the conjunction of every rule column
    bad = out.filter(
        F.col("keep") != (F.col("r_word_count") & F.col("r_mean_len")
                          & F.col("r_alpha") & F.col("r_stop")
                          & F.col("r_bullet") & F.col("r_ellipsis")
                          & F.col("r_symbol"))).count()
    assert bad == 0


def test_gopher_rules_bullet_and_symbol(spark):
    from incubator_hugegraph_spark.data.clean import gopher_rules
    fixture = spark.createDataFrame(
        [(1, "- one\n- two\n- three\nplain"),
         (2, "# # # # tag soup"),
         (3, "trailing off...\nanother line...")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_rules(fixture).collect()}
    assert abs(out[1].bullet_frac - 0.75) < 1e-6
    assert out[2].hash_ratio > 0.1 and not out[2].r_symbol
    assert abs(out[3].ellipsis_frac - 1.0) < 1e-6 and not out[3].r_ellipsis


def test_domain_sample_deterministic_and_scoped(docs):
    from incubator_hugegraph_spark.data.sample import domain_sample
    fr = {"src0": 0.25, "src1": 0.75}
    a = domain_sample(docs, fr).select("doc_id")
    b = domain_sample(docs, fr).select("doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # unlisted domains keep everything
    n_other = docs.filter(~F.col("source").isin("src0", "src1")).count()
    kept_other = domain_sample(docs, fr).filter(
        ~F.col("source").isin("src0", "src1")).count()
    assert kept_other == n_other
    # listed domains are subsampled below their full size
    n0 = docs.filter("source = 'src0'").count()
    k0 = domain_sample(docs, fr).filter("source = 'src0'").count()
    assert 0 < k0 < n0


def test_c4_clean_rules(spark):
    from incubator_hugegraph_spark.data.clean import c4_clean
    fixture = spark.createDataFrame(
        [(1, "This is a good long sentence here.\n"
             "too short.\n"
             "no terminal punctuation at all in this line\n"
             "A second proper sentence rounds it out!\n"
             "And a third one finishes the page?"),
         (2, "Pure javascript should be dropped right here.\n"
             "lorem ipsum dolor sit amet consectetur adipiscing elit."),
         (3, "Braces { kill the whole page immediately always.\n"
             "Even with a perfectly fine sentence like this one.")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in c4_clean(fixture).collect()}
    # doc 1: 5 lines; "too short." (<5 words) and the no-punct line drop
    assert out[1].n_lines == 5 and out[1].n_kept == 3
    assert out[1].keep and not out[1].has_lorem and not out[1].has_brace
    # doc 2: javascript line dropped, lorem-ipsum page flag set
    assert out[2].has_lorem and not out[2].keep and out[2].n_kept == 1
    # doc 3: brace page flag
    assert out[3].has_brace and not out[3].keep
    # cleaned text is exactly the retained lines, in order
    kept1 = out[1].cleaned.split("\n")
    assert kept1 == ["This is a good long sentence here.",
                     "A second proper sentence rounds it out!",
                     "And a third one finishes the page?"]


def test_ngram_lm_score_exact(spark):
    import math
    from incubator_hugegraph_spark.data.text import ngram_lm_score
    # tiny corpus with a hand-computable model
    fixture = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "z")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in ngram_lm_score(fixture, k=0.1).collect()}
    # vocab = {a,b,c,z} → V=4; unigrams: a=3,b=3,c=1,z=1
    # bigrams: (a,b)=3, (b,a)=1, (b,c)=1
    V, kk = 4, 0.1
    def p(c2, c1):
        return math.log((c2 + kk) / (c1 + kk * V))
    exp1 = (p(3, 3) + p(1, 3) + p(3, 3)) / 3      # a b / b a / a b
    assert abs(out[1].avg_logp - round(exp1, 6)) < 1e-6
    assert out[1].n_bigrams == 3
    exp2 = (p(3, 3) + p(1, 3)) / 2                # a b / b c
    assert abs(out[2].avg_logp - round(exp2, 6)) < 1e-6
    assert 3 not in out            # single-token doc has no bigrams
    assert abs(out[2].ppl - round(math.exp(-exp2), 4)) < 1e-3


def test_ngram_lm_separate_model(spark):
    from incubator_hugegraph_spark.data.text import ngram_lm_score
    model = spark.createDataFrame([(10, "a b a b")],
                                  "doc_id long, text string")
    docs = spark.createDataFrame([(1, "a q")],
                                 "doc_id long, text string")
    row = ngram_lm_score(docs, model_docs=model, k=0.5).head()
    # unseen bigram (a,q): c2=0, c1(a)=2, V=2 → ln(0.5 / 3.0)
    import math
    assert abs(row.avg_logp - round(math.log(0.5 / 3.0), 6)) < 1e-6


def test_token_budget_sample_exact_prefix(spark):
    from incubator_hugegraph_spark.data.sample import token_budget_sample
    fixture = spark.createDataFrame(
        [(1, "a b c", 5.0),        # 3 tokens, best score
         (2, "d e", 5.0),          # 2 tokens, tie → id order
         (3, "f g h i", 3.0),      # 4 tokens
         (4, "j", 1.0),            # 1 token, worst
         (5, "k l", None)],        # unscored → keep=false row
        "doc_id long, text string, score double")
    out = {r.id: r for r in
           token_budget_sample(fixture, budget=6, n_bins=4).collect()}
    # unscored docs stay in the output, marked rejected, so callers
    # can audit the full cut line (review r06)
    assert not out[5].keep and out[5].cum_before is None
    assert out[1].cum_before == 0 and out[1].keep
    assert out[2].cum_before == 3 and out[2].keep
    # doc 3 starts at 5 < 6 → included (crossing doc), doc 4 at 9 → out
    assert out[3].cum_before == 5 and out[3].keep
    assert out[4].cum_before == 9 and not out[4].keep


def test_token_budget_bins_partition_order(spark):
    # exactness does not depend on bin count
    from incubator_hugegraph_spark.data.sample import token_budget_sample
    rows = [(i, " ".join(["w"] * (i % 7 + 1)), float((i * 37) % 101))
            for i in range(200)]
    fixture = spark.createDataFrame(
        rows, "doc_id long, text string, score double")
    a = token_budget_sample(fixture, budget=300, n_bins=1).collect()
    b = token_budget_sample(fixture, budget=300, n_bins=64).collect()
    ka = {(r.id, r.cum_before, r.keep) for r in a}
    kb = {(r.id, r.cum_before, r.keep) for r in b}
    assert ka == kb


def test_semantic_dedup_keep_rule(emb):
    """SemDeDup invariant: a doc survives iff it has NO smaller-id
    same-cell neighbor with rounded cosine above the threshold —
    recomputed independently in numpy."""
    import numpy as np

    from incubator_hugegraph_spark.data.dedup import semantic_dedup

    tau = 0.35
    kept = semantic_dedup(emb, n_cells=16, threshold=tau).collect()
    rows = sorted((r.vec_id, np.array(r.embedding, dtype=np.float64))
                  for r in emb.select("vec_id", "embedding").collect())
    ids = [i for i, _ in rows]
    M = np.stack([v for _, v in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    seeds = M[:16]  # first 16 by id
    cell = (M @ seeds.T).argmax(axis=1)  # ties: argmax takes lowest
    sims = np.round(M @ M.T, 6)
    expect = set()
    for i in range(len(ids)):
        dup = any(cell[j] == cell[i] and sims[i, j] > tau
                  for j in range(i))
        if not dup:
            expect.add(ids[i])
    assert {r.id for r in kept} == expect
    # cell column matches the assignment
    got_cell = {r.id: r.cell for r in kept}
    for i, vid in enumerate(ids):
        if vid in got_cell:
            assert got_cell[vid] == ids[cell[i]]


def test_global_shuffle_deterministic_and_shuffle_free(docs):
    from incubator_hugegraph_spark.data.sample import global_shuffle

    a = global_shuffle(docs, n_shards=8, seed="epoch0")
    b = global_shuffle(docs, n_shards=8, seed="epoch0")
    ra, rb = a.collect(), b.collect()
    assert sorted(map(tuple, ra)) == sorted(map(tuple, rb))
    assert {r.shard for r in ra} <= set(range(8))
    # a different seed re-permutes (some doc changes shard or order)
    c = {r.doc_id: (r.shard, r.ord)
         for r in global_shuffle(docs, seed="epoch1").collect()}
    assert any(c[r.doc_id] != (r.shard, r.ord) for r in ra)
    # the query itself plans zero exchanges (write-time repartition is
    # the only data movement)
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_dsir_weights_invariants(docs):
    from incubator_hugegraph_spark.data.sample import dsir_weights

    # target == raw  =>  the two models coincide and every log-ratio
    # is exactly 0 — all weights must be exactly 0.0
    zero = dsir_weights(docs, docs, n_buckets=512)
    assert zero.filter(F.col("w") != 0.0).count() == 0
    assert zero.count() == docs.count()

    # a real target slice: docs FROM the target domain must score
    # higher on average than the rest (the op's reason to exist)
    from pyspark.sql import functions as SF
    tgt = docs.filter(SF.col("source") == "src0")
    w = dsir_weights(docs, tgt, n_buckets=4096)
    joined = w.join(docs.select(SF.col("doc_id").alias("id"), "source"),
                    on="id")
    means = dict(joined.groupBy(SF.col("source") == "src0")
                 .agg(SF.avg("w")).collect())
    assert means[True] > means[False]
    # the bucket-model join must broadcast (model is n_buckets rows)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_bpe_pair_counts(spark):
    from incubator_hugegraph_spark.data.text import bpe_pair_counts
    docs = spark.createDataFrame(
        [(1, "abab ab"), (2, "abab cd")], "doc_id long, text string")
    got = {r.pair: r.cnt for r in bpe_pair_counts(docs, top=10).collect()}
    # 'abab' ×2 contributes ab:2,ba:1 each; 'ab' ×1 → ab:1; 'cd' ×1
    assert got == {"ab": 5, "ba": 2, "cd": 1}
    # single-char words contribute nothing
    one = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert bpe_pair_counts(one).count() == 0


def test_vocab_coverage(spark):
    from incubator_hugegraph_spark.data.text import vocab_coverage
    docs = spark.createDataFrame(
        [(1, "the the rare", "s1"), (2, "the word", "s2")],
        "doc_id long, text string, source string")
    # vocab_size 1 → vocab = {'the'} (count 3)
    rows = {r.source: r for r in
            vocab_coverage(docs, vocab_size=1).collect()}
    assert rows["s1"].total_tokens == 3 and rows["s1"].covered_tokens == 2
    assert rows["s2"].covered_tokens == 1
    # huge vocab → full coverage everywhere
    full = vocab_coverage(docs, vocab_size=100)
    assert full.filter(F.col("coverage") != 1.0).count() == 0
    # the vocab join must broadcast (vocab is N-bounded)
    plan = full._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in plan or "broadcast" in plan.lower()


def test_source_overlap(spark):
    from incubator_hugegraph_spark.data.clean import source_overlap
    docs = spark.createDataFrame(
        [(1, "a b c d", "s1"), (2, "a b c e", "s2"),
         (3, "x y z w", "s3")],
        "doc_id long, text string, source string")
    rows = {(r.src_a, r.src_b): r for r in
            source_overlap(docs, n=3).collect()}
    # s1 grams {abc,bcd}, s2 grams {abc,bce}: inter 1, union 3
    assert rows[("s1", "s2")].inter == 1
    assert abs(rows[("s1", "s2")].jaccard - 1 / 3) < 1e-6
    # s3 shares nothing — no row (pairs come only from the gram join)
    assert ("s1", "s3") not in rows and ("s2", "s3") not in rows
    # size-table joins must be broadcast
    plan = source_overlap(docs)._jdf.queryExecution().analyzed().toString()
    assert plan.count("ResolvedHint") >= 2, plan


def test_window_topk_stream_matches_batch(spark, tmp_path):
    import uuid
    from incubator_hugegraph_spark.streaming.events import (
        run_stream_window_topk, window_topk)
    ev = "/root/testdata/sf0.001/events.parquet"
    batch = window_topk(spark.read.parquet(ev)) \
        .orderBy("window_start", "rank")
    stream = run_stream_window_topk(
        spark, ev, name="stk_t_" + uuid.uuid4().hex[:6]) \
        .orderBy("window_start", "rank")
    assert [tuple(r) for r in batch.collect()] == \
        [tuple(r) for r in stream.collect()]
    # rank input is the bounded count table: exactly k rows per window
    per_w = batch.groupBy("window_start").count()
    assert per_w.filter(F.col("count") > 3).count() == 0


def test_chunk_docs(spark):
    import pytest as _pt
    from incubator_hugegraph_spark.data.sample import chunk_docs
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))],
        "doc_id long, text string")
    rows = chunk_docs(docs, chunk_tokens=4, overlap=1).collect()
    # stride 3, starts 1,4,7 → chunks [0:4],[3:7],[6:10]
    assert [r.chunk_ix for r in rows] == [0, 1, 2]
    assert rows[0].chunk == "w0 w1 w2 w3"
    assert rows[1].chunk == "w3 w4 w5 w6"
    assert rows[2].chunk == "w6 w7 w8 w9"
    # consecutive chunks share exactly `overlap` tokens
    assert rows[0].chunk.split()[-1:] == rows[1].chunk.split()[:1]
    # tail shorter than chunk size is kept
    tail = chunk_docs(docs, chunk_tokens=4, overlap=2).collect()
    assert tail[-1].n_tokens <= 4 and sum(1 for _ in tail) == 4
    with _pt.raises(ValueError):
        chunk_docs(docs, chunk_tokens=4, overlap=4)
    # zero shuffle: no Exchange in the physical plan
    plan = chunk_docs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_chunk_docs_reconstructs_token_stream(spark):
    from incubator_hugegraph_spark.data.sample import chunk_docs
    lengths = [0, 1, 3, 4, 7, 10, 17, 64]
    docs = spark.createDataFrame(
        [(n, " ".join(f"t{j}" for j in range(n))) for n in lengths],
        "doc_id long, text string")
    for chunk, overlap in [(4, 0), (4, 1), (5, 2), (8, 3)]:
        rows = chunk_docs(docs, chunk_tokens=chunk,
                          overlap=overlap).collect()
        by_id: dict[int, list] = {}
        for r in sorted(rows, key=lambda r: (r.id, r.chunk_ix)):
            by_id.setdefault(r.id, []).append(r.chunk.split())
        for n in lengths:
            toks = [f"t{j}" for j in range(n)]
            got = by_id.get(n, [])
            if n == 0:
                assert got == []
                continue
            # drop each chunk's leading `overlap` tokens after the
            # first — the remainder must tile the stream exactly
            rebuilt = list(got[0])
            for c in got[1:]:
                rebuilt.extend(c[overlap:])
            assert rebuilt == toks, (chunk, overlap, n)
            assert all(len(c) <= chunk for c in got)


def test_value_histogram_stream_matches_batch(spark):
    import uuid
    from incubator_hugegraph_spark.streaming.events import (
        run_stream_value_histogram, value_histogram)
    ev = "/root/testdata/sf0.001/events.parquet"
    batch = sorted(tuple(r) for r in value_histogram(
        spark.read.parquet(ev)).collect())
    stream = sorted(tuple(r) for r in run_stream_value_histogram(
        spark, ev, name="sh_t_" + uuid.uuid4().hex[:6]).collect())
    assert batch == stream
    # totals conserved, state bounded by bins+2
    assert sum(n for _, _, n in batch) == spark.read.parquet(ev).count()
    assert len(batch) <= 22
    # under/overflow routing
    edge = spark.createDataFrame(
        [(-.5,), (0.0,), (499.99,), (500.0,), (1e9,)], "value double")
    got = {r.bin: r.n for r in value_histogram(edge).collect()}
    assert got[-1] == 1 and got[20] == 2 and got[0] == 1 and got[19] == 1


def _bpe_reference(word_counts, n_merges):
    # textbook BPE (Sennrich et al. 2016 learn_bpe), pure Python
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))  # tie: lexical
        if pairs[best] < 2:
            break
        merges.append(best)
        out = {}
        for sym, c in vocab.items():
            merged, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and (sym[i], sym[i + 1]) == best
                        and (not merged or True)):
                    merged.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            out[tuple(merged)] = out.get(tuple(merged), 0) + c
        vocab = out
    return merges, vocab


def test_bpe_train_matches_reference(spark):
    from incubator_hugegraph_spark.data.text import bpe_train
    corpus = ["low low low lower lowest", "new newer newest low",
              "wide wider widest new new"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    wc: dict[str, int] = {}
    for t in corpus:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    ref_merges, ref_vocab = _bpe_reference(wc, 8)
    merges, vocab_df = bpe_train(docs, n_merges=8)
    assert merges == ref_merges
    got = {r.w: tuple(r.symbols) for r in vocab_df.collect()}
    expect = {}
    for sym, c in ref_vocab.items():
        expect["".join(sym)] = sym
    assert got == expect


def test_cross_neardup(spark):
    from incubator_hugegraph_spark.data.dedup import cross_neardup
    base = "the quick brown fox jumps over the lazy dog again and again"
    train = spark.createDataFrame(
        [(1, base), (2, base + " tail"), (3, "completely different "
                                             "words about spark plans")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, base + " extra"), (101, "unrelated benchmark prompt "
                                       "holdout sentence")],
        "doc_id long, text string")
    got = {(r.train_id, r.bench_id) for r in
           cross_neardup(train, bench, threshold=0.3).collect()}
    # the planted near-dup crossing sides is found; the within-train
    # near-dup pair (1,2) is NOT reported (no train-by-train work)
    assert (1, 100) in got and (2, 100) in got
    assert all(b == 100 for _, b in got)
    assert not any(a == 1 and b == 2 for a, b in got)


def test_ccnet_buckets(spark):
    from incubator_hugegraph_spark.data.text import ccnet_buckets
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = ccnet_buckets(docs).collect()
    n = len(rows)
    by = {}
    for r in rows:
        by.setdefault(r.bucket, []).append(r.avg_logp)
    # terciles: each bucket within one of a third; ordering respected
    assert set(by) == {"head", "middle", "tail"}
    for b, vals in by.items():
        assert abs(len(vals) - n / 3) <= n / 3 * 0.2 + 2, (b, len(vals))
    assert min(by["head"]) >= max(by["middle"])
    assert min(by["middle"]) >= max(by["tail"])


def test_label_centroid_stats(spark):
    from incubator_hugegraph_spark.data.similarity import (
        label_centroid_stats)
    # two tight orthogonal classes + one noisy class
    rows = [(0, [1.0, 0.0, 0.0]), (0, [0.9, 0.1, 0.0]),
            (1, [0.0, 1.0, 0.0]), (1, [0.0, 0.95, 0.05]),
            (2, [1.0, 0.0, 0.0]), (2, [-1.0, 0.0, 0.0])]
    emb = spark.createDataFrame(
        [(i, v, l) for i, (l, v) in enumerate(rows)],
        "vec_id long, embedding array<double>, label int")
    got = {r.label: r for r in label_centroid_stats(emb).collect()}
    assert got[0].n == 2 and got[1].n == 2
    assert got[0].mean_cos > 0.99 and got[1].mean_cos > 0.99
    # the antipodal class has near-zero cohesion (centroid ~ 0)
    assert got[2].mean_cos < 0.5
    # centroid table must broadcast
    plan = label_centroid_stats(emb) \
        ._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in plan, plan


@pytest.mark.slow  # verify-budget tier (r11): see pytest.ini
def test_stream_kmv_matches_batch(spark, tmp_path):
    import uuid
    from incubator_hugegraph_spark.data.sketch import kmv_distinct
    from incubator_hugegraph_spark.streaming.events import (
        run_stream_kmv_distinct)
    ev = "/root/testdata/sf0.001/events.parquet"
    batch = kmv_distinct(spark.read.parquet(ev), "user_id",
                         k=256).head()
    stream = run_stream_kmv_distinct(
        spark, ev, name="skmv_t_" + uuid.uuid4().hex[:6]).head()
    assert tuple(batch) == tuple(stream)
    # micro-batch invariance: chop the input into 3 files — the
    # k-min fold must land on the identical final state
    df = spark.read.parquet(ev)
    df.repartition(3).write.mode("overwrite").parquet(
        str(tmp_path / "chopped"))
    chopped = run_stream_kmv_distinct(
        spark, str(tmp_path / "chopped"),
        name="skmv_c_" + uuid.uuid4().hex[:6]).head()
    assert tuple(chopped) == tuple(batch)


def test_dedup_keep_best(spark):
    from incubator_hugegraph_spark.data.dedup import (dedup_clusters,
                                                      dedup_keep_best)
    base = "the quick brown fox jumps over a lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base, 60), (2, base + " longer tail words", 80),
         (3, base + " tail", 65), (9, "entirely different text about "
                                      "catalyst plans and shuffles", 50)],
        "doc_id long, text string, n_chars long")
    kept = dedup_keep_best(docs, threshold=0.3).collect()
    # one cluster {1,2,3}: the longest (2) wins; 9 unclustered → absent
    assert len(kept) == 1
    assert kept[0].kept_doc == 2 and kept[0].score == 80
    # exactly one keep per cluster
    n_clusters = dedup_clusters(docs, threshold=0.3) \
        .select("keeper").distinct().count()
    assert n_clusters == 1


def test_value_outliers(spark):
    from incubator_hugegraph_spark.streaming.events import value_outliers
    rows = ([(i, "a", 10.0) for i in range(50)]
            + [(100, "a", 1000.0)]            # the planted outlier
            + [(200, "b", 5.0), (201, "b", 5.0)])  # zero-variance type
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double")
    got = value_outliers(ev).collect()
    assert [r.event_id for r in got] == [100]
    assert got[0].zscore > 3
    # the moment table must broadcast
    plan = value_outliers(ev)._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in plan, plan


def test_stream_stream_join_matches_batch(spark):
    import uuid
    from incubator_hugegraph_spark.streaming.events import (
        click_to_purchase, run_stream_click_to_purchase)
    ev = "/root/testdata/sf0.001/events.parquet"
    batch = sorted(tuple(r) for r in click_to_purchase(
        spark.read.parquet(ev)).collect())
    stream = sorted(tuple(r) for r in run_stream_click_to_purchase(
        spark, ev, name="ssj_t_" + uuid.uuid4().hex[:6]).collect())
    assert batch == stream and len(batch) > 0
    # every pair respects the time bound
    assert all(0 < g <= 30 * 60 * 1_000_000 for *_, g in batch)


def test_hamming_hot_bucket_guard(spark):
    """VERDICT r06 item 6: a degenerate fingerprint (flat image /
    silent audio) shared by thousands of rows must not form a
    quadratic bucket in hamming_near_pairs. With a forced small cap,
    a planted 10k-identical-fingerprint corpus completes and the
    honest near pairs are still found; on the same data the capped
    default is pair-identical to the exact (max_bucket=None) kernel
    when no bucket exceeds it."""
    from incubator_hugegraph_spark.data.dedup import hamming_near_pairs
    # 10k rows of the SAME degenerate fingerprint + 4 honest rows
    # forming 2 near pairs far from the degenerate value
    degenerate = spark.range(10_000).select(
        F.col("id"), F.lit(0).cast("long").alias("fp"))
    honest_rows = [(100_001, 0x0F0F0F0F0F0F0F0F),
                   (100_002, 0x0F0F0F0F0F0F0F0E),
                   (100_003, 0x00FF00FF00FF00FF),
                   (100_004, 0x00FF00FF00FF00FD)]
    honest = spark.createDataFrame(honest_rows, "id long, fp long")
    corpus = degenerate.unionByName(honest)
    got = {(r.d1, r.d2) for r in hamming_near_pairs(
        corpus, 3, hash_col="fp", id_col="id",
        max_bucket=50).collect()}
    # the two honest pairs survive; the 10k-identical group (≈50M
    # pairs) is stop-hashed out, so the result is tiny, not quadratic
    assert got == {(100_001, 100_002), (100_003, 100_004)}
    # equivalence on healthy data: capped default == exact kernel
    exact = {(r.d1, r.d2, r.hamming) for r in hamming_near_pairs(
        honest, 3, hash_col="fp", id_col="id",
        max_bucket=None).collect()}
    capped = {(r.d1, r.d2, r.hamming) for r in hamming_near_pairs(
        honest, 3, hash_col="fp", id_col="id").collect()}
    assert exact == capped == {(100_001, 100_002, 1),
                               (100_003, 100_004, 1)}


def test_jpeg_decoder_envelope_and_headers():
    """decode_jpeg_rgb returns None (never raises) outside its
    documented envelope — arithmetic-coded SOF9, a baseline stream
    RELABELED as progressive (its scan script is then invalid),
    truncated entropy data — and the shared header parser reads the
    same dims the pixel decoder produces. The r08 in-envelope
    additions (real SOF2 scripts, 4:2:0/4:2:2) have positive tests
    in test_properties; here the 0x22-sampled stream now DECODES
    (the content is a valid interleaved 4:2:0-style layout only if
    encoded that way — flipping just the SOF byte of a 4:4:4 stream
    desyncs the MCU walk, which must surface as None, not garbage
    pixels or a crash)."""
    from incubator_hugegraph_spark.data.jpeg import encode_jpeg_rgb
    from incubator_hugegraph_spark.data.multimodal import (
        _parse_jpeg, decode_image_rgb)
    import numpy as np
    raw = np.arange(16 * 8 * 3, dtype=np.uint8).tobytes()
    enc = encode_jpeg_rgb(raw, 16, 8)
    hdr = _parse_jpeg(enc)
    assert hdr == {"width": 16, "height": 8, "duration_ms": None}
    got = decode_image_rgb(enc)
    assert got is not None and (got[0], got[1]) == (16, 8)
    # a baseline stream RELABELED SOF2: the single interleaved
    # 3-component full-band scan is illegal progressive (AC scans
    # must be single-component), so None — never garbage
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_image_rgb(prog) is None
    # arithmetic-coded SOF9: out of envelope
    arith = enc.replace(b"\xff\xc0", b"\xff\xc9", 1)
    assert decode_image_rgb(arith) is None
    # flipping ONLY the sampling byte of a 4:4:4 stream claims 4:2:0
    # geometry the entropy data doesn't have. JPEG carries no
    # checksum, so (like libjpeg) the desynced walk may yield garbage
    # pixels or fail — the contract is it NEVER raises, and any
    # result it does produce carries the header's claimed dims. The
    # positive subsampled cases are encoded with real 4:2:0/4:2:2
    # scripts in test_properties.
    i = enc.find(b"\xff\xc0")
    sub = bytearray(enc)
    sub[i + 11] = 0x22  # comp 1 sampling byte
    got_sub = decode_image_rgb(bytes(sub))
    assert got_sub is None or (got_sub[0], got_sub[1]) == (16, 8)
    # truncated entropy data
    assert decode_image_rgb(enc[:len(enc) // 2]) is None
    # garbage
    assert decode_image_rgb(b"\xff\xd8\xff\xd9") is None


def test_dhash_rides_pixels_across_codecs():
    """dHash is a PIXEL-structure hash: the same image encoded as
    PNG (lossless) and baseline JPEG (near-lossless at unit tables)
    must land within a couple of bits — the property that makes
    cross-codec near-dup detection work."""
    import numpy as np
    from incubator_hugegraph_spark.data.jpeg import encode_jpeg_rgb
    from incubator_hugegraph_spark.data.multimodal import (
        dhash_rgb, encode_png_rgb, synth_media_bytes)
    w, h = 24, 16
    raw = synth_media_bytes(5, w * h * 3).tobytes()
    hp = dhash_rgb(encode_png_rgb(raw, w, h))
    hj = dhash_rgb(encode_jpeg_rgb(raw, w, h))
    assert hp is not None and hj is not None
    assert bin((hp ^ hj) & ((1 << 64) - 1)).count("1") <= 2


def test_gif_lzw_boundaries():
    """LZW code-width boundaries and the 4096-entry re-clear (review
    r07): the final data code's table append can land exactly on a
    2^width boundary, growing the DECODER's width before EOI — the
    encoder must write EOI at the grown width (regression: a
    byte-aligned de Bruijn stream at the 512-entry boundary decoded
    to None). High-entropy inputs long enough to force the dictionary
    re-clear round-trip exactly."""
    import numpy as np

    from incubator_hugegraph_spark.data.gif import (
        decode_gif_rgb, encode_gif_gray)

    def de_bruijn_256_2():
        import sys as _sys
        _sys.setrecursionlimit(100_000)
        a = [0] * 512
        seq: list = []

        def db(t, p):
            if t > 2:
                if 2 % p == 0:
                    seq.extend(a[1:p + 1])
            else:
                a[t] = a[t - p]
                db(t + 1, p)
                for j in range(a[t - p] + 1, 256):
                    a[t] = j
                    db(t + 1, t)

        db(1, 1)
        return seq

    base = de_bruijn_256_2() * 3
    # 4093 = the recorded EOI-boundary repro; 255/1021 sit on earlier
    # width boundaries; 14400 forces a mid-stream dictionary re-clear
    for L in (255, 1021, 4093, 14400):
        data = bytes(base[:L])
        got = decode_gif_rgb(encode_gif_gray(data, L, 1))
        assert got is not None, f"len {L} decoded to None"
        want = np.repeat(np.frombuffer(data, dtype=np.uint8),
                         3).tobytes()
        assert bytes(got[2]) == want, f"len {L} pixel mismatch"


def test_gif_decoder_envelope():
    """decode_gif_rgb handles the spec's corner cases and returns
    None (never raises) outside its envelope: KwKwK codes (constant
    runs), extension blocks before the image, truncated LZW data.
    Flipping ONLY the interlace flag on a sequential stream (r08:
    interlace now decodes) must apply the deinterlace scatter — i.e.
    return the ROW PERMUTATION of the sequential pixels, exactly."""
    import numpy as np

    from incubator_hugegraph_spark.data.gif import (
        _interlace_order, decode_gif_rgb, encode_gif_gray)
    from incubator_hugegraph_spark.data.multimodal import (
        decode_image_rgb)
    # KwKwK: constant image
    enc = encode_gif_gray(bytes([9]) * 64, 8, 8)
    got = decode_gif_rgb(enc)
    assert got is not None and bytes(got[2]) == bytes([9]) * 192
    # the shared image dispatch reaches the GIF leg
    assert decode_image_rgb(enc) is not None
    # a graphic-control extension before the image is skipped
    with_ext = (enc[:13 + 768]
                + b"\x21\xf9\x04\x00\x00\x00\x00\x00"
                + enc[13 + 768:])
    got2 = decode_image_rgb(with_ext)
    assert got2 is not None and bytes(got2[2]) == bytes([9]) * 192
    # flipping ONLY the interlace flag on a ROW-DISTINCT sequential
    # stream: the decoder must scatter stored row j to display row
    # order[j] — assert the exact permutation, not just non-None
    rows = bytes(bytearray(r for r in range(8) for _ in range(8)))
    enc_rows = encode_gif_gray(rows, 8, 8)
    inter = bytearray(enc_rows)
    inter[13 + 768 + 9] |= 0x40  # image descriptor flags byte
    got3 = decode_gif_rgb(bytes(inter))
    assert got3 is not None
    img = np.frombuffer(bytes(got3[2]), np.uint8).reshape(8, 8, 3)
    for src, dst in enumerate(_interlace_order(8)):
        assert (img[dst] == src).all()
    # truncated LZW -> None
    assert decode_gif_rgb(enc[:len(enc) - 4]) is None
    # garbage -> None
    assert decode_gif_rgb(b"GIF89a" + b"\x00" * 4) is None


def test_dedup_substrings_cuts_planted_boilerplate(spark):
    """ExactSubstr removal (Lee et al.): a 5-token boilerplate
    planted in 3 docs is cut from ALL of them (every position under
    a duplicated 3-gram goes); unique text survives in original
    order; a doc that IS the boilerplate comes back empty."""
    from incubator_hugegraph_spark.data.clean import dedup_substrings
    bp = "all rights reserved contact us"
    docs = spark.createDataFrame(
        [(1, f"alpha beta {bp} gamma delta"),
         (2, f"{bp} epsilon zeta"),
         (3, bp),
         (4, "totally unique words here")],
        "doc_id long, text string")
    got = {r.id: (r.clean_text, r.n_tokens, r.n_removed)
           for r in dedup_substrings(docs, n=3, min_docs=2).collect()}
    assert got[1] == ("alpha beta gamma delta", 9, 5)
    assert got[2] == ("epsilon zeta", 7, 5)
    assert got[3] == ("", 5, 5)
    assert got[4] == ("totally unique words here", 4, 0)


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn streams (T.81 B.2.4.4): encoding with a restart
    interval emits byte-aligned RSTn markers with DC predictors
    reset, and the decoder's resync path reproduces the plain
    stream's pixels exactly."""
    import numpy as np

    from incubator_hugegraph_spark.data.jpeg import (
        decode_jpeg_rgb, encode_jpeg_rgb)
    rng = np.random.RandomState(42)
    w, h = 33, 21
    raw = rng.randint(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    plain = decode_jpeg_rgb(encode_jpeg_rgb(raw, w, h))
    for ri in (1, 2, 5):
        enc = encode_jpeg_rgb(raw, w, h, restart_interval=ri)
        assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
        got = decode_jpeg_rgb(enc)
        assert got is not None
        assert bytes(got[2]) == bytes(plain[2])


def test_hamming_cross_hot_bucket_guard(spark):
    """The stop-hash guard covers the cross-corpus leg too (review
    r07): a degenerate fingerprint massive on BOTH sides cannot form
    a |train| x |bench| bucket; honest cross pairs survive, and the
    capped default equals the exact kernel on healthy data."""
    from incubator_hugegraph_spark.data.dedup import hamming_cross_pairs
    left = spark.range(5_000).select(
        F.col("id"), F.lit(0).cast("long").alias("fp")).unionByName(
        spark.createDataFrame([(900_001, 0x0F0F0F0F0F0F0F0F)],
                              "id long, fp long"))
    right = spark.range(5_000).select(
        (F.col("id") + 10_000).alias("id"),
        F.lit(0).cast("long").alias("fp")).unionByName(
        spark.createDataFrame([(900_002, 0x0F0F0F0F0F0F0F0E)],
                              "id long, fp long"))
    got = {(r.d1, r.d2) for r in hamming_cross_pairs(
        left, right, 3, hash_col="fp", id_col="id",
        max_bucket=50).collect()}
    assert got == {(900_001, 900_002)}
    exact = {(r.d1, r.d2, r.hamming) for r in hamming_cross_pairs(
        left.filter(F.col("id") > 100_000),
        right.filter(F.col("id") > 100_000),
        3, hash_col="fp", id_col="id", max_bucket=None).collect()}
    capped = {(r.d1, r.d2, r.hamming) for r in hamming_cross_pairs(
        left.filter(F.col("id") > 100_000),
        right.filter(F.col("id") > 100_000),
        3, hash_col="fp", id_col="id").collect()}
    assert exact == capped == {(900_001, 900_002, 1)}


def test_resize_normalizes_all_codecs_to_png():
    """resize_image_rgb's one-format-out contract (review r07): small
    JPEG/GIF inputs re-encode to PNG with identical pixels; small
    PNGs pass through byte-identical; oversized inputs of any codec
    come out as resized PNGs."""
    import numpy as np
    from incubator_hugegraph_spark.data.gif import encode_gif_gray
    from incubator_hugegraph_spark.data.jpeg import encode_jpeg_rgb
    from incubator_hugegraph_spark.data.multimodal import (
        decode_png_rgb, encode_png_rgb, resize_image_rgb,
        synth_media_bytes)
    gray = synth_media_bytes(3, 8 * 8).reshape(8, 8)
    rgb = np.stack([gray] * 3, axis=2).astype(np.uint8).tobytes()
    png = encode_png_rgb(rgb, 8, 8)
    assert resize_image_rgb(png, 16) == png  # byte-identical
    for enc, tol in ((encode_jpeg_rgb(rgb, 8, 8), 6),   # lossy codec
                     (encode_gif_gray(gray.astype(np.uint8).tobytes(),
                                      8, 8), 0)):        # lossless
        out = resize_image_rgb(enc, 16)
        assert out is not None and out[:8] == b"\x89PNG\r\n\x1a\n"
        got = decode_png_rgb(out)
        assert got is not None
        diff = np.abs(
            np.frombuffer(bytes(got[2]), dtype=np.uint8).astype(int)
            - np.frombuffer(rgb, dtype=np.uint8).astype(int))
        assert diff.max() <= tol
        big = resize_image_rgb(enc, 4)
        assert big is not None and big[:8] == b"\x89PNG\r\n\x1a\n"
        assert decode_png_rgb(big)[0] == 4


@pytest.mark.slow  # verify-budget tier (r11): see pytest.ini
def test_ann_index_pruned_and_row_identical(spark, tmp_path):
    """Persisted ANN indexes (data/ann_index.py): the write-side
    counterpart of ivf_topk/lsh_ann_topk. Results must be
    row-identical to the in-memory kernels (same centroids, planes,
    rank order), and the query scans must carry PartitionFilters on
    the bucket key — the index-once/query-many 100 TB shape where a
    probe reads directories, never the corpus."""
    from tests.conftest import SF_DIR

    from incubator_hugegraph_spark.data.ann_index import (
        ivf_index_topk, lsh_index_topk, write_ivf_index,
        write_lsh_index)
    from incubator_hugegraph_spark.data.similarity import (
        ivf_topk, lsh_ann_topk)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = [0, 1, 2]
    base = str(tmp_path)

    import re

    write_ivf_index(emb, f"{base}/ivf", n_cells=16)
    want = sorted(map(tuple, ivf_topk(emb, qids, 10).collect()))
    idx = ivf_index_topk(spark, f"{base}/ivf", qids, 10, n_probe=4)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[cell#\d+ (INSET|IN)", plan)
    assert sorted(map(tuple, idx.collect())) == want

    row = emb.select("embedding").first()
    dim = len(row[0])
    qvecs = [(r["vec_id"], list(r["embedding"]))
             for r in emb.filter(emb.vec_id.isin(qids)).collect()]
    want = sorted(map(tuple, lsh_ann_topk(emb, qids, 10, dim).collect()))
    # both storage modes must agree with the in-memory kernel: the
    # n_tables-x layout (vectors ride the buckets) and the 1x layout
    # (id-only buckets + a (id, v) side table fetched at re-rank)
    for sv, sub in ((True, "lsh"), (False, "lsh1x")):
        write_lsh_index(emb, f"{base}/{sub}", dim, store_vectors=sv)
        lidx = lsh_index_topk(spark, f"{base}/{sub}", qvecs, 10)
        lplan = lidx._jdf.queryExecution().executedPlan().toString()
        if sv:
            assert "PartitionFilters: [struct(table" in lplan
        else:
            # the 1x layout's final plan starts at the candidate
            # checkpoint; its visible scan is the (id, v) side table
            # carrying the pushed id IN-list (row-group skipping)
            assert "PushedFilters: [In(id" in lplan
        assert sorted(map(tuple, lidx.collect())) == want
    # a query vector that disagrees with the build dim raises loudly
    # instead of silently hashing into the wrong buckets
    with pytest.raises(ValueError, match="dim"):
        lsh_index_topk(spark, f"{base}/lsh", [(0, [1.0, 2.0])], 10)
    with pytest.raises(ValueError, match="dim"):
        ivf_index_topk(spark, f"{base}/ivf", k=10,
                       query_vecs=[(0, [1.0, 2.0])])


@pytest.mark.slow  # verify-budget tier (r11): see pytest.ini
def test_ivf_pq_index_adc_shortlist_and_parity(spark, tmp_path):
    """PQ tier on IVF (r09): the build persists per-vector codes
    (m_sub small ints + the exact norm) partitioned by cell; the
    query scores candidates ASYMMETRICALLY from the codes scan alone
    (driver-side lookup table, JVM-side zip_with/aggregate fold),
    shortlists, then exact-re-ranks against the full vectors.
    Asserts: (a) with rerank covering the candidate pool the result
    is ROW-IDENTICAL to the unquantized ivf_index_topk; (b) the ADC
    ordering is informative — a tight shortlist (rerank=32 over a
    ~120-vector pool) still recovers most of the true top-10; (c)
    the codes scan carries PartitionFilters on cell; (d) codes rows
    are genuinely compact (m_sub entries < n_codes); (e) misuse
    doors raise (dim mismatch, non-dividing m_sub, non-PQ path)."""
    import re

    from tests.conftest import SF_DIR

    from incubator_hugegraph_spark.data.ann_index import (
        ivf_index_topk, ivf_pq_index_topk, write_ivf_index,
        write_ivf_pq_index)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = str(tmp_path)
    write_ivf_index(emb, f"{base}/ivf", n_cells=16)
    write_ivf_pq_index(emb, f"{base}/pq", n_cells=16, m_sub=8,
                       n_codes=16)
    qvecs = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in emb.filter(F.col("vec_id") <= 4).collect()]
    want = sorted(map(tuple, ivf_index_topk(
        spark, f"{base}/ivf", query_vecs=qvecs, k=10,
        n_probe=4).collect()))
    pq = ivf_pq_index_topk(spark, f"{base}/pq", qvecs, k=10,
                           n_probe=4, rerank=10_000)
    plan = pq._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[cell#\d+ (INSET|IN)", plan)
    assert sorted(map(tuple, pq.collect())) == want
    # tight shortlist: the ADC ordering must be informative, not a
    # coin flip — deterministic corpus, so the recall is a constant
    tight = ivf_pq_index_topk(spark, f"{base}/pq", qvecs, k=10,
                              n_probe=4, rerank=32)
    hits = len(set(map(tuple, tight.collect())) & set(want))
    assert hits >= int(0.6 * len(want))
    # codes are compact: exactly m_sub entries, every code < n_codes
    codes = spark.read.parquet(f"{base}/pq/codes")
    bad = codes.filter(
        (F.size("codes") != 8)
        | (F.array_max("codes") >= 16)
        | (F.array_min("codes") < 0)
        | F.col("vnorm").isNull()).count()
    assert bad == 0
    with pytest.raises(ValueError, match="dim"):
        ivf_pq_index_topk(spark, f"{base}/pq", [(0, [1.0])], k=10)
    with pytest.raises(ValueError, match="m_sub"):
        write_ivf_pq_index(emb, f"{base}/bad", m_sub=7)
    with pytest.raises(ValueError, match="PQ meta"):
        ivf_pq_index_topk(spark, f"{base}/ivf", qvecs, k=10)
    with pytest.raises(ValueError, match="rerank"):
        ivf_pq_index_topk(spark, f"{base}/pq", qvecs, k=10, rerank=5)
    # appending to a PQ index would desynchronize codes from vectors
    # (the shortlist reads codes only) — hard misuse door
    from incubator_hugegraph_spark.data.ann_index import \
        append_ivf_index
    with pytest.raises(ValueError, match="PQ index"):
        append_ivf_index(emb, f"{base}/pq", batch_id=1)
    # RESIDUAL scheme (IVF-ADC, Jégou et al. §IV): codes quantize
    # v − centroid[cell], the exact dot(q, centroid) re-enters
    # driver-side. Parity with the unquantized probe pins the whole
    # qcdot + residual-LUT arithmetic; at a tight shortlist the
    # residual ADC must beat the fixture's 0.6 floor too (measured:
    # 43/50 vs plain's 40/50 at rerank=32 — tighter residual energy)
    write_ivf_pq_index(emb, f"{base}/pqr", n_cells=16, m_sub=8,
                       n_codes=16, residual=True)
    resid = ivf_pq_index_topk(spark, f"{base}/pqr", qvecs, k=10,
                              n_probe=4, rerank=10_000)
    assert sorted(map(tuple, resid.collect())) == want
    rtight = ivf_pq_index_topk(spark, f"{base}/pqr", qvecs, k=10,
                               n_probe=4, rerank=32)
    rhits = len(set(map(tuple, rtight.collect())) & set(want))
    assert rhits >= int(0.6 * len(want))
    # NON-DENSE ids (r09 review: codebook codes must be densified at
    # build — the kmeans kernel labels centroids with seed-row IDS,
    # dense only by fixture luck): shift every vec_id by 10_007 and
    # the PQ path must still agree with the unquantized probe
    shifted = emb.withColumn("vec_id", F.col("vec_id") + 10_007)
    write_ivf_index(shifted, f"{base}/sivf", n_cells=16)
    write_ivf_pq_index(shifted, f"{base}/spq", n_cells=16, m_sub=8,
                       n_codes=16)
    sqvecs = [(qid + 10_007, qv) for qid, qv in qvecs]
    swant = sorted(map(tuple, ivf_index_topk(
        spark, f"{base}/sivf", query_vecs=sqvecs, k=10,
        n_probe=4).collect()))
    sgot = sorted(map(tuple, ivf_pq_index_topk(
        spark, f"{base}/spq", sqvecs, k=10, n_probe=4,
        rerank=10_000).collect()))
    assert sgot == swant


@pytest.mark.slow  # verify-budget tier (r11): see pytest.ini
def test_ivf_pq_index_append_codes_aware(spark, tmp_path):
    """append_ivf_pq_index (r09): appending against the FROZEN
    centroids AND codebooks must be query-identical to a one-shot
    build over the full corpus (seeds/codebooks derive from the
    first ids, present in the prefix either way) — for the plain AND
    residual schemes, at a discriminating probe width. Replaying a
    batch_id is idempotent for BOTH vectors/ and codes/; mixed-dim
    batches reject whole-batch; a non-PQ path raises."""
    from tests.conftest import SF_DIR

    from incubator_hugegraph_spark.data.ann_index import (
        append_ivf_pq_index, ivf_pq_index_topk, write_ivf_index,
        write_ivf_pq_index)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    prefix = emb.filter(F.col("vec_id") < 250)
    rest = emb.filter(F.col("vec_id") >= 250)
    base = str(tmp_path)
    qvecs = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in emb.filter(F.col("vec_id") <= 2).collect()]

    def q(path):
        return sorted(map(tuple, ivf_pq_index_topk(
            spark, path, qvecs, k=5, n_probe=3,
            rerank=64).collect()))

    for scheme, res in (("plain", False), ("resid", True)):
        inc, ref = f"{base}/{scheme}_inc", f"{base}/{scheme}_ref"
        write_ivf_pq_index(prefix, inc, n_cells=16, m_sub=8,
                           n_codes=16, residual=res)
        append_ivf_pq_index(rest, inc, batch_id=1)
        write_ivf_pq_index(emb, ref, n_cells=16, m_sub=8,
                           n_codes=16, residual=res)
        got = q(inc)
        assert got == q(ref) and len(got) == 15
        # the appended half must actually be reachable (not just the
        # prefix re-ranked): at least one neighbor id >= 250
        assert any(nid >= 250 for _, nid, _ in got)
        # at-least-once replay: both vectors/ AND codes/ overwrite
        # only their own batch partitions
        append_ivf_pq_index(rest, inc, batch_id=1)
        assert q(inc) == got
    bad = spark.createDataFrame([(99_999, [1.0, 2.0])],
                                "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dim"):
        append_ivf_pq_index(bad, f"{base}/plain_inc", batch_id=2)
    write_ivf_index(emb, f"{base}/plainivf", n_cells=8)
    with pytest.raises(ValueError, match="not a PQ index"):
        append_ivf_pq_index(rest, f"{base}/plainivf", batch_id=1)


def test_ivf_index_incremental_append(spark, tmp_path):
    """Index maintenance under ingest: building on a prefix and
    appending the rest in batches (frozen centroids) must be
    query-identical to a TRUE one-shot build over the full corpus —
    the seeds (first 8 ids) are the same either way — at a
    discriminating probe width (n_probe < n_cells, review r07: an
    all-cells probe is assignment-insensitive). Replaying a batch_id
    must be idempotent (foreachBatch at-least-once), and a mixed-dim
    batch must be rejected whole-batch."""
    from tests.conftest import SF_DIR

    from incubator_hugegraph_spark.data.ann_index import (
        append_ivf_index, ivf_index_topk, write_ivf_index)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    seed = emb.filter(F.col("vec_id") < 100)
    rest1 = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 300))
    rest2 = emb.filter(F.col("vec_id") >= 300)
    base = str(tmp_path)
    write_ivf_index(seed, f"{base}/inc", n_cells=8)
    append_ivf_index(rest1, f"{base}/inc", batch_id=1)
    append_ivf_index(rest2, f"{base}/inc", batch_id=2)

    def q(path, np=3):
        return sorted(map(tuple, ivf_index_topk(
            spark, path, [0, 1], 5, n_probe=np).collect()))

    got = q(f"{base}/inc")
    # TRUE one-shot reference: same first-8-id seed centroids
    write_ivf_index(emb, f"{base}/ref", n_cells=8)
    assert got == q(f"{base}/ref") and len(got) == 10
    # at-least-once replay: re-appending the same batch_id must not
    # duplicate vectors (dynamic overwrite of that batch's partitions)
    append_ivf_index(rest2, f"{base}/inc", batch_id=2)
    assert q(f"{base}/inc") == got
    # rebuild-after-append under a DYNAMIC session overwrite conf
    # (review r08): the build must pin static mode, or the rebuild
    # keeps the stale batch=1/2 partitions and duplicates vectors
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    old_conf = spark.conf.get(conf_key, "static")
    spark.conf.set(conf_key, "dynamic")
    try:
        write_ivf_index(emb, f"{base}/inc", n_cells=8)
    finally:
        spark.conf.set(conf_key, old_conf)
    assert q(f"{base}/inc") == got
    # whole-batch dim guard: one bad row anywhere rejects the batch
    bad = spark.createDataFrame([(99_999, [1.0, 2.0])],
                                "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dim"):
        append_ivf_index(bad, f"{base}/inc", batch_id=3)
    # full probe still equals brute force over the whole corpus
    from incubator_hugegraph_spark.data.similarity import cosine_topk
    brute = sorted(map(tuple, cosine_topk(emb, [0, 1], 5).collect()))
    assert q(f"{base}/inc", np=8) == brute


@pytest.mark.slow  # verify-budget tier (r11): see pytest.ini
def test_compact_index_parity_all_kinds(spark, tmp_path):
    """compact_index (optimization r10, the r09 verdict's ANN scale
    finding): folding accumulated batch=N append partitions into the
    static batch=-1 base must be query-identical for all three index
    kinds — IVF, IVF+PQ (codes AND vectors), LSH (both storage
    layouts) — must leave NO batch=N partitions behind, and a
    REPLAYED append of a compacted batch id must no-op (at-least-once
    delivery stays idempotent across a compaction)."""
    import os

    from tests.conftest import SF_DIR

    from incubator_hugegraph_spark.data.ann_index import (
        append_ivf_index, append_ivf_pq_index, append_lsh_index,
        compact_index, ivf_index_topk, ivf_pq_index_topk,
        lsh_index_topk, write_ivf_index, write_ivf_pq_index,
        write_lsh_index)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    seed = emb.filter(F.col("vec_id") < 200)
    rest1 = emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300))
    rest2 = emb.filter(F.col("vec_id") >= 300)
    qvecs = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in emb.filter(F.col("vec_id") <= 2).collect()]
    base = str(tmp_path)

    def batch_dirs(path):
        out = []
        for root, dirs, _ in os.walk(path):
            out += [d for d in dirs if d.startswith("batch=")]
        return out

    # (kind path, build, append(batch_df, bid), query)
    cases = []
    write_ivf_index(seed, f"{base}/ivf", n_cells=8)
    cases.append((
        f"{base}/ivf",
        lambda b, i: append_ivf_index(b, f"{base}/ivf", batch_id=i),
        lambda: sorted(map(tuple, ivf_index_topk(
            spark, f"{base}/ivf", [0, 1], 5, n_probe=3).collect()))))
    write_ivf_pq_index(seed, f"{base}/pq", n_cells=16, m_sub=8,
                       n_codes=16)
    cases.append((
        f"{base}/pq",
        lambda b, i: append_ivf_pq_index(b, f"{base}/pq", batch_id=i),
        lambda: sorted(map(tuple, ivf_pq_index_topk(
            spark, f"{base}/pq", qvecs, k=5, n_probe=3,
            rerank=64).collect()))))
    for sv, sub in ((True, "lsh_a"), (False, "lsh_b")):
        write_lsh_index(seed, f"{base}/{sub}", dim, store_vectors=sv)
        cases.append((
            f"{base}/{sub}",
            lambda b, i, s=sub: append_lsh_index(
                b, f"{base}/{s}", batch_id=i),
            lambda s=sub: sorted(map(tuple, lsh_index_topk(
                spark, f"{base}/{s}", qvecs, 5).collect()))))
    for path, append, q in cases:
        append(rest1, 1)
        append(rest2, 2)
        want = q()
        assert any("batch=1" == d or "batch=2" == d
                   for d in batch_dirs(path))
        compact_index(spark, path)
        assert set(batch_dirs(path)) == {"batch=-1"}, path
        assert q() == want, path
        # replayed compacted batch id must no-op (no duplicates)
        append(rest2, 2)
        assert q() == want, path
        assert set(batch_dirs(path)) == {"batch=-1"}, path
        # a genuinely NEW batch still appends normally post-compact
        append(rest2.limit(0), 3)  # empty new batch: layout-only
        assert q() == want, path


@pytest.mark.slow  # verify-budget tier (r11): see pytest.ini
def test_compact_index_skips_half_appended_batch(spark, tmp_path):
    """Review r10: a batch that crashed between the PQ codes and
    vectors writes (the exact window the codes-first order exists
    for) must NOT be folded or marked compacted — marking it would
    turn the healing replay into a no-op and lose the batch's
    vectors permanently. Compaction must fold only batches present
    in EVERY table, leave the half batch's partitions in place, and
    let the replay overwrite them; a later compaction then folds the
    healed batch."""
    import os
    import shutil

    from tests.conftest import SF_DIR

    from incubator_hugegraph_spark.data.ann_index import (
        _compacted_batches, append_ivf_pq_index, compact_index,
        ivf_pq_index_topk, write_ivf_pq_index)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    seed = emb.filter(F.col("vec_id") < 200)
    rest1 = emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300))
    rest2 = emb.filter(F.col("vec_id") >= 300)
    qvecs = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in emb.filter(F.col("vec_id") <= 2).collect()]
    path = f"{tmp_path}/pq"
    ref = f"{tmp_path}/pq_ref"

    def q(p):
        return sorted(map(tuple, ivf_pq_index_topk(
            spark, p, qvecs, k=5, n_probe=3, rerank=64).collect()))

    def batch_dirs(sub):
        out = set()
        for root, dirs, _ in os.walk(f"{path}/{sub}"):
            out |= {d for d in dirs if d.startswith("batch=")}
        return out

    write_ivf_pq_index(seed, path, n_cells=16, m_sub=8, n_codes=16)
    append_ivf_pq_index(rest1, path, batch_id=1)
    append_ivf_pq_index(rest2, path, batch_id=2)
    # simulate the crash window: batch 2's codes landed, vectors
    # didn't
    for root, dirs, _ in os.walk(f"{path}/vectors"):
        for d in dirs:
            if d == "batch=2":
                shutil.rmtree(os.path.join(root, d))
    compact_index(spark, path)
    assert _compacted_batches(spark, path) == {1}
    assert "batch=2" in batch_dirs("codes")      # NOT folded
    assert "batch=2" not in batch_dirs("vectors")
    # the healing replay is NOT a no-op: it completes the batch
    append_ivf_pq_index(rest2, path, batch_id=2)
    # reference: the same seed-build + appends, no crash (a one-shot
    # build over the union would train different codebooks)
    write_ivf_pq_index(seed, ref, n_cells=16, m_sub=8, n_codes=16)
    append_ivf_pq_index(rest1, ref, batch_id=1)
    append_ivf_pq_index(rest2, ref, batch_id=2)
    assert q(path) == q(ref)
    # and a later compaction folds the healed batch
    compact_index(spark, path)
    assert _compacted_batches(spark, path) == {1, 2}
    assert batch_dirs("codes") == {"batch=-1"}
    assert batch_dirs("vectors") == {"batch=-1"}
    assert q(path) == q(ref)
    append_ivf_pq_index(rest2, path, batch_id=2)  # replay now no-ops
    assert q(path) == q(ref)


@pytest.mark.slow  # verify-budget tier (r11): see pytest.ini
def test_lsh_index_incremental_append(spark, tmp_path):
    """LSH twin of the IVF append test: planes are pure functions of
    (table, plane, dim), so seed-build + appends must be
    query-identical to a one-shot build over the union; batch_id
    replay must be idempotent; both storage layouts covered."""
    from tests.conftest import SF_DIR

    from incubator_hugegraph_spark.data.ann_index import (
        append_lsh_index, lsh_index_topk, write_lsh_index)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    seed = emb.filter(F.col("vec_id") < 200)
    rest = emb.filter(F.col("vec_id") >= 200)
    qvecs = [(r["vec_id"], list(r["embedding"]))
             for r in emb.filter(emb.vec_id.isin([0, 1])).collect()]
    base = str(tmp_path)
    for sv, sub in ((True, "a"), (False, "b")):
        write_lsh_index(seed, f"{base}/{sub}", dim, store_vectors=sv)
        append_lsh_index(rest, f"{base}/{sub}", batch_id=1)
        got = sorted(map(tuple, lsh_index_topk(
            spark, f"{base}/{sub}", qvecs, 5).collect()))
        write_lsh_index(emb, f"{base}/{sub}_ref", dim,
                        store_vectors=sv)
        want = sorted(map(tuple, lsh_index_topk(
            spark, f"{base}/{sub}_ref", qvecs, 5).collect()))
        assert got == want and len(got) == 10
        # replay: same batch_id overwrites its own partitions only
        append_lsh_index(rest, f"{base}/{sub}", batch_id=1)
        again = sorted(map(tuple, lsh_index_topk(
            spark, f"{base}/{sub}", qvecs, 5).collect()))
        assert again == got
        # rebuild-after-append (review r08): a fresh BUILD at a path
        # that previously received appends must equal a fresh-path
        # build. The full-corpus rebuild overlaps the stale batch=1
        # ids, so the store_vectors=False hazard (build-time dynamic
        # overwrite keeping old batch=N vector partitions, duplicating
        # re-rank candidates) would be caught here as extra top-k
        # rows. Runs under a DYNAMIC session overwrite conf — build
        # writes must pin static mode explicitly, not inherit it.
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        old_conf = spark.conf.get(conf_key, "static")
        spark.conf.set(conf_key, "dynamic")
        try:
            write_lsh_index(emb, f"{base}/{sub}", dim,
                            store_vectors=sv)
        finally:
            spark.conf.set(conf_key, old_conf)
        rebuilt = sorted(map(tuple, lsh_index_topk(
            spark, f"{base}/{sub}", qvecs, 5).collect()))
        assert rebuilt == want

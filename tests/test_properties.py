"""Property-based tests (hypothesis) for the pure-Python kernels that
oracle parity leans on — no SparkSession needed, so these run in
milliseconds and catch constant-regression bugs early."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_decoder_none_contract_under_random_mutation(data):
    """MUTATION FUZZ of the whole codec tier (r09): take a VALID
    stream of every supported container (PNG incl. Adam7, baseline +
    progressive JPEG, GIF still/interlaced/animated incl.
    disposal-3, BMP, WAV, raw-DIB AVI, MJPEG AVI), apply random
    byte flips / truncations / slice duplications, and feed the
    result to EVERY pure decoder door. The contract under test is
    the one the whole Spark tier leans on: malformed bytes map to
    None (or a well-formed result when the mutation lands in unused
    padding bytes),
    NEVER an exception escaping to kill an executor task — the
    hazard class every r07-r09 review wave found instances of."""
    from incubator_hugegraph_spark.data.gif import decode_gif_frames
    from incubator_hugegraph_spark.data.jpeg import decode_jpeg_rgb
    from incubator_hugegraph_spark.data.multimodal import (
        decode_avi_frames, decode_bmp_rgb, decode_header,
        decode_image_rgb, decode_png_rgb, decode_wav_samples,
        render_media_avi, render_media_bmp, render_media_gif,
        render_media_gif_anim, render_media_gif_disposal3,
        render_media_jpeg, render_media_mjpeg, render_media_png,
        render_media_wav)

    builders = [
        lambda: render_media_png(7, 9, 5),
        lambda: render_media_jpeg(7, 2, 2),
        lambda: render_media_gif(7, 9, 5),
        lambda: render_media_gif(7, 9, 5, interlace=True),
        lambda: render_media_gif_anim(7, 3, 6, 4),
        lambda: render_media_gif_disposal3(7, 2, 6, 4),
        lambda: render_media_bmp(7, 9, 5),
        lambda: render_media_wav(7, 64),
        lambda: render_media_avi(7, 2),
        lambda: render_media_mjpeg(7, 2, 2, 2),
        lambda: render_media_jpeg(7, 2, 2, progressive=True),
        lambda: render_media_jpeg(7, 2, 2, subsampling="4:2:0"),
    ]
    b = bytearray(builders[data.draw(
        st.integers(0, len(builders) - 1), label="format")]())
    n_mut = data.draw(st.integers(1, 6), label="n_mutations")
    for _ in range(n_mut):
        op = data.draw(st.integers(0, 3), label="op")
        pos = data.draw(st.integers(0, max(0, len(b) - 1)),
                        label="pos")
        if op == 0 and b:                 # flip one byte
            b[pos] ^= data.draw(st.integers(1, 255))
        elif op == 1:                     # truncate
            b = b[:pos]
        elif op == 2 and b:               # overwrite with a run
            v = data.draw(st.integers(0, 255))
            b[pos:pos + 16] = bytes([v]) * min(16, len(b) - pos)
        elif op == 3 and b:               # duplicate a slice
            b = b[:pos] + b[pos:pos + 32] + b[pos:]
    blob = bytes(b)
    for door in (decode_image_rgb, decode_png_rgb, decode_jpeg_rgb,
                 decode_bmp_rgb, decode_gif_frames,
                 decode_wav_samples, decode_avi_frames):
        door(blob)  # must not raise; None or a result both fine
    for modality in ("image", "audio", "video"):
        decode_header(blob, modality)

from incubator_hugegraph_spark.data.dedup import _COEFFS, _P, _det_coeffs
from incubator_hugegraph_spark.data.similarity import plane_component
from incubator_hugegraph_spark.functions.ids import splice_id


@given(st.integers(min_value=0, max_value=10_000),
       st.integers(min_value=0, max_value=4096))
def test_plane_component_bounds_and_determinism(p, j):
    x = plane_component(p, j)
    assert -1.0 <= x < 1.0
    assert x == plane_component(p, j)  # pure function of (p, j)


def test_minhash_coeffs_in_field():
    assert len(_COEFFS) == 64
    for a, b in _COEFFS:
        assert 1 <= a < _P
        assert 0 <= b < _P
    # deterministic: regeneration yields the identical constants the
    # DuckDB oracles embed as literals
    assert _det_coeffs(64) == _COEFFS


@given(st.text(min_size=0, max_size=50),
       st.text(min_size=0, max_size=50))
def test_splice_id_injective_on_values(v1, v2):
    """Escaping must keep splicing injective: different value tuples
    never collide into the same id."""
    if v1 != v2:
        assert splice_id("l", v1) != splice_id("l", v2)
    assert splice_id("l", v1, v2) != splice_id("l", v1 + "!" + v2)


@given(st.lists(st.integers(min_value=0, max_value=7), min_size=0,
                max_size=30))
def test_segmented_arange_structure(lengths):
    import numpy as np
    from incubator_hugegraph_spark.ram import _segmented_arange
    out = _segmented_arange(np.asarray(lengths, dtype=np.int64))
    want = [i for n in lengths for i in range(n)]
    assert out.tolist() == want


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=50))
def test_round_half_up6_matches_decimal(xs):
    xs = list(xs) + [-0.0078125, 0.0078125, -1.0000005]  # exact ties
    import decimal
    import numpy as np
    from incubator_hugegraph_spark.ram import _round_half_up6
    got = _round_half_up6(np.asarray(xs, dtype=np.float64))
    for x, g in zip(xs, got):
        want = float(decimal.Decimal(repr(np.float64(x))).quantize(
            decimal.Decimal("0.000001"),
            rounding=decimal.ROUND_HALF_UP))
        # repr() of the double is the shortest round-trip literal —
        # the same value Spark/DuckDB see; HALF_UP on it must agree
        assert g == want, (x, g, want)


_idchars = st.text(
    alphabet=st.sampled_from("abcz019!"), min_size=1, max_size=6)


@given(st.lists(_idchars, min_size=2, max_size=8, unique=True),
       _idchars, _idchars)
def test_vkey_rank_orders_path_extensions(ids, ext1, ext2):
    """The MNSP kernel's id||'>' ranking (ram._vkey_rank) must equal
    the RAW string order of any same-length path extension — the
    property the distributed loop's F.min(path) relies on. This is
    exactly the '!'/digit-below-'>' prefix subtlety."""
    import numpy as np
    from incubator_hugegraph_spark.ram import _vkey_rank
    arr = np.sort(np.asarray(ids, dtype="U"))
    rank = _vkey_rank(arr)
    for i in range(len(arr)):
        for j in range(len(arr)):
            if i == j:
                continue
            # extend both with one more hop; the shared suffix differs
            # only after the separator of the SHORTER key, so key rank
            # must predict the raw comparison
            p1 = arr[i] + ">" + ext1
            p2 = arr[j] + ">" + ext2
            if rank[i] < rank[j]:
                assert p1 < p2 or (arr[i] + ">") == (arr[j] + ">")
            elif rank[i] > rank[j]:
                assert p1 > p2 or (arr[i] + ">") == (arr[j] + ">")


@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                min_size=0, max_size=60))
def test_union_find_pairs_is_min_of_components(pairs):
    """streaming/incremental._union_find_pairs maps every touched
    node to the minimum of its connected component."""
    from incubator_hugegraph_spark.streaming.incremental import (
        _union_find_pairs)
    spairs = [(str(a), str(b)) for a, b in pairs]
    got = _union_find_pairs(spairs)
    # brute-force components over the touched nodes
    import itertools
    nodes = {x for p in spairs for x in p}
    comp = {x: x for x in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in spairs:
            m = min(comp[a], comp[b])
            for x in (a, b):
                if comp[x] != m:
                    comp[x] = m
                    changed = True
        # propagate transitively
        for x in nodes:
            while comp[comp[x]] != comp[x]:
                comp[x] = comp[comp[x]]
                changed = True
    assert got == comp


@given(st.lists(st.text(alphabet="ab!019", min_size=1, max_size=5),
                min_size=1, max_size=12, unique=True),
       st.integers(min_value=2, max_value=4))
def test_unroll_templates_counts(ids, times):
    """_unroll_templates enumerates every repeat combination exactly
    once: one step with max_times=t → t sequences of lengths 1..t."""
    from incubator_hugegraph_spark.operators.paths import _unroll_templates
    seqs = _unroll_templates([{"max_times": times}])
    assert sorted(len(s) for s in seqs) == list(range(1, times + 1))
    two = _unroll_templates([{"max_times": times}, {"max_times": 2}])
    assert len(two) == times * 2


# ---- round 3: pure-python property tests for new kernels ------------


@given(st.lists(st.sampled_from(["数据", "数据库", "库存", "系统",
                                 "分布式", "的"]), min_size=0,
                max_size=12))
def test_fmm_covers_input_losslessly(words):
    """Segmenting any concatenation of CJK text reproduces every
    character exactly once, in order (FMM/RMM/BiMM are partitions of
    the input — no char lost or duplicated)."""
    from incubator_hugegraph_spark.functions.text import (
        DEFAULT_CJK_DICT, _bimm_segment, _fmm_segment, _rmm_segment)
    text = "".join(words)
    maxlen = max(map(len, DEFAULT_CJK_DICT))
    for seg in (_fmm_segment, _rmm_segment, _bimm_segment):
        toks = seg(text, DEFAULT_CJK_DICT, maxlen)
        assert "".join(toks) == text


@given(st.text(alphabet="ab числ英語x9 .,", max_size=30))
def test_fmm_never_crashes_on_arbitrary_text(text):
    from incubator_hugegraph_spark.functions.text import (
        DEFAULT_CJK_DICT, _fmm_segment)
    toks = _fmm_segment(text, DEFAULT_CJK_DICT, 5)
    assert all(t for t in toks)  # no empty tokens


@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                max_size=30))
def test_bimm_never_longer_than_either_pass(pairs):
    """BiMM picks one of the two passes — its token count equals the
    min of the two (the disambiguation rule)."""
    from incubator_hugegraph_spark.functions.text import (
        DEFAULT_CJK_DICT, _bimm_segment, _fmm_segment, _rmm_segment)
    import random
    rng = random.Random(42)
    words = sorted(DEFAULT_CJK_DICT)
    text = "".join(words[a % len(words)] for a, _ in pairs)
    maxlen = max(map(len, DEFAULT_CJK_DICT))
    f = _fmm_segment(text, DEFAULT_CJK_DICT, maxlen)
    r = _rmm_segment(text, DEFAULT_CJK_DICT, maxlen)
    b = _bimm_segment(text, DEFAULT_CJK_DICT, maxlen)
    assert len(b) == min(len(f), len(r))


@given(st.lists(st.sampled_from(["数据", "数据库", "库存", "系统",
                                 "分布式", "的"]), min_size=0,
                max_size=12))
def test_dag_covers_input_losslessly(words):
    """The DAG/unigram-cost segmenter is also a partition of the
    input (r06 Jieba-slot kernel)."""
    from incubator_hugegraph_spark.functions.text import (
        DEFAULT_CJK_DICT, _dag_segment)
    text = "".join(words)
    maxlen = max(map(len, DEFAULT_CJK_DICT))
    toks = _dag_segment(text, DEFAULT_CJK_DICT, maxlen)
    assert "".join(toks) == text


@given(st.lists(st.sampled_from(["数据", "数据库", "系统", "分布式",
                                 "的", "命"]), min_size=1, max_size=10))
def test_dag_never_more_tokens_than_fmm(words):
    """The DP maximizes path log-probability; with uniform word freqs
    and an OOV penalty below any word, its token count never exceeds
    greedy FMM's (FMM's segmentation is one of the DAG's paths)."""
    from incubator_hugegraph_spark.functions.text import (
        DEFAULT_CJK_DICT, _dag_segment, _fmm_segment)
    text = "".join(words)
    maxlen = max(map(len, DEFAULT_CJK_DICT))
    f = _fmm_segment(text, DEFAULT_CJK_DICT, maxlen)
    d = _dag_segment(text, DEFAULT_CJK_DICT, maxlen)
    assert len(d) <= len(f)


def test_dag_beats_greedy_on_classic_ambiguity():
    """研究生命起源 — THE textbook case where greedy maximum matching
    fails: FMM takes 研究生 and strands an out-of-vocabulary 命; the
    DAG's OOV penalty selects the all-known path. This is the
    semantic separation that makes cjk_dag a distinct kernel, not a
    re-labeled FMM (r05 verdict item 7)."""
    from incubator_hugegraph_spark.functions.text import (
        _dag_segment, _fmm_segment)
    d = frozenset({"研究", "研究生", "生命", "起源", "的"})
    assert _fmm_segment("研究生命起源", d, 3) == ["研究生", "命", "起源"]
    assert _dag_segment("研究生命起源", d, 3) == ["研究", "生命", "起源"]
    # and where the longer word IS right, the DP keeps it
    assert _dag_segment("研究生的生命", d, 3) == ["研究生", "的", "生命"]


@given(st.lists(st.sampled_from("甲乙丙丁戊"), min_size=1, max_size=9))
def test_hmm_finalseg_is_lossless_partition(chars):
    """The BMES Viterbi is a partition of the OOV run (every char
    exactly once, in order) with no empty tokens, and under the
    default tables every word is 1-3 chars (the only lengths the
    default transition structure makes optimal)."""
    from incubator_hugegraph_spark.functions.text import _viterbi_bmes
    run = "".join(chars)
    toks = _viterbi_bmes(run)
    assert "".join(toks) == run
    assert all(toks)
    assert all(1 <= len(t) <= 3 for t in toks)


def test_hmm_viterbi_tolerates_sparse_user_tables():
    """Users passing trained tables naturally omit impossible states
    (start with only B/S) or leave states unreachable — the decode
    must stay a lossless partition, never KeyError or drop chars
    (second review pass r06: both failure modes were live)."""
    import math as m

    from incubator_hugegraph_spark.functions.text import _viterbi_bmes
    # sparse start (B/S only) — the documented shape
    toks = _viterbi_bmes("甲乙丙丁", start={"B": m.log(0.6),
                                           "S": m.log(0.4)})
    assert "".join(toks) == "甲乙丙丁"
    # degenerate trans: E and S unreachable — partition still holds
    toks = _viterbi_bmes("甲乙丙", trans={"B": {"M": -1.0},
                                          "M": {"M": -1.0}})
    assert "".join(toks) == "甲乙丙"


@given(st.lists(st.sampled_from(["研究", "生命", "甲", "乙", "丙"]),
                min_size=0, max_size=10))
def test_hmm_regroup_preserves_known_words(words):
    """The finalseg pass only touches OOV singles: dictionary words
    survive verbatim and in order."""
    from incubator_hugegraph_spark.functions.text import (
        _dag_segment, _hmm_regroup)
    D = frozenset({"研究", "生命"})
    text = "".join(words)
    toks = _dag_segment(text, D, 2)
    out = _hmm_regroup(toks, D)
    assert "".join(out) == text
    assert [t for t in out if t in D] == [t for t in toks if t in D]


def test_hmm_pairs_oov_runs():
    """Default-table behavior pin: an even OOV run pairs into 2-char
    words; an odd run leaves exactly one 1- or 3-char remainder —
    Jieba's documented unknown-text behavior (finalseg)."""
    from incubator_hugegraph_spark.functions.text import _viterbi_bmes
    assert _viterbi_bmes("甲乙丙丁") == ["甲乙", "丙丁"]
    odd = _viterbi_bmes("甲乙丙丁戊")
    assert "".join(odd) == "甲乙丙丁戊"
    assert sum(1 for t in odd if len(t) != 2) == 1


def test_dag_analyzer_registered(spark):
    from incubator_hugegraph_spark.functions.text import segment
    df = spark.createDataFrame([("研究生命起源abc",)], "t string")
    toks = df.select(segment("t", "cjk_dag").alias("s")).head().s
    assert "".join(toks).startswith("研究")  # partition, mixed script ok
    assert toks[-1] == "abc"


@given(st.recursive(
    st.one_of(st.just("_"),
              st.floats(min_value=0.5, max_value=9.5).map(
                  lambda f: f"{f:.2f}")),
    lambda inner: st.tuples(inner, st.sampled_from("+-*/"), inner).map(
        lambda t: f"({t[0]} {t[1]} {t[2]})"),
    max_leaves=8))
def test_math_parser_matches_python_eval(expr):
    """The gremlin math() compiler agrees with python eval on random
    arithmetic over '_' (spot-checked at _=2.5)."""
    from incubator_hugegraph_spark.gremlin import _MathParser
    import pyspark.sql.functions as F

    # python floats + operators behave identically to Columns, so
    # run the same parser with cur=2.5 by monkeypatching F.lit
    orig_lit = F.lit
    F.lit = lambda v: float(v)
    try:
        try:
            got = _MathParser(expr, 2.5).expr()
        except ZeroDivisionError:
            return  # constant-folded zero denominator in float mode
    finally:
        F.lit = orig_lit
    try:
        want = eval(expr.replace("_", "2.5"))  # noqa: S307 — test-only
    except ZeroDivisionError:
        return  # Column division yields null there — different domain
    assert abs(got - want) < 1e-9 or (got != got and want != want)


@given(st.lists(st.lists(st.text(alphabet="ab!\\>", max_size=6),
                         min_size=1, max_size=3),
                min_size=2, max_size=6))
def test_sort_values_encoding_is_injective(tuples):
    """encode_sort_values must be injective per arity class: two
    distinct sort-key tuples can never produce the same sort_values
    string, or two distinct edges collapse into one EdgeId (r05
    escape-char fix). Alphabet stresses the delimiter '!', the escape
    '\\', and (r06) the '>' EdgeId splice delimiter."""
    from incubator_hugegraph_spark.functions.ids import (
        encode_sort_values)
    enc = {}
    for tup in tuples:
        key = encode_sort_values(tup)
        if key in enc:
            assert enc[key] == tuple(tup), (
                f"collision: {enc[key]!r} and {tuple(tup)!r} both "
                f"encode to {key!r}")
        enc[key] = tuple(tup)


@given(st.lists(st.text(alphabet="xy!\\>", max_size=5),
                min_size=1, max_size=3))
def test_splice_id_python_column_parity(values):
    """splice_id (driver-side) and splice_id_col (Column-side) must
    agree byte-for-byte — ids written by fixtures/pandas UDFs and by
    Column programs key the same tables."""
    from incubator_hugegraph_spark.functions.ids import splice_id
    import re
    py = splice_id("l", *values)
    # reference regexp semantics of _escape_col, evaluated in Python
    # (escape char first, then '!' and '>' — r06 adds the EdgeId
    # splice delimiter to the escape set):
    col_sim = "!".join(
        ["l"] + [re.sub(r">", r"\\>",
                        re.sub(r"!", r"\\!",
                               re.sub(r"\\", r"\\\\", v)))
                 for v in values])
    assert py == col_sim


@settings(deadline=None)  # first call pays numpy/zlib import cost
@given(st.integers(min_value=1, max_value=23),
       st.integers(min_value=1, max_value=17),
       st.integers(min_value=0, max_value=2**31))
def test_png_roundtrip_property(w, h, seed):
    """encode_png_rgb → decode_png_rgb is the identity on arbitrary
    8-bit RGB buffers of any dims (all five filters exercised for
    h >= 5; partial filter sets below)."""
    import numpy as np

    from incubator_hugegraph_spark.data.multimodal import (
        decode_png_rgb, encode_png_rgb)
    rng = np.random.RandomState(seed % (2**31))
    raw = rng.randint(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    got = decode_png_rgb(encode_png_rgb(raw, w, h))
    assert got is not None
    assert (got[0], got[1]) == (w, h)
    assert bytes(got[2]) == raw


@given(st.integers(min_value=1, max_value=500),
       st.integers(min_value=0, max_value=2**31))
def test_wav_pcm_roundtrip_property(n, seed):
    """wrap_wav → decode_wav_samples recovers arbitrary int16 streams
    exactly (odd/even lengths cover the RIFF pad byte)."""
    import numpy as np

    from incubator_hugegraph_spark.data.multimodal import (
        decode_wav_samples, wrap_wav)
    rng = np.random.RandomState(seed % (2**31))
    s = rng.randint(-32768, 32768, n).astype("<i2")
    got = decode_wav_samples(wrap_wav(s.tobytes()))
    assert got is not None and np.array_equal(got, s)


@settings(deadline=None)
@given(st.integers(min_value=1, max_value=20),
       st.integers(min_value=5, max_value=15),
       st.integers(min_value=-30, max_value=30),
       st.integers(min_value=0, max_value=2**31))
def test_dhash_brightness_invariance(w, h, shift, seed):
    """dHash is invariant under uniform brightness shifts that don't
    wrap (the perceptual property the near-dup join relies on):
    adding a constant to every channel preserves all adjacent-gray
    comparisons."""
    import numpy as np

    from incubator_hugegraph_spark.data.multimodal import (
        _dhash_of_rgb_array)
    rng = np.random.RandomState(seed % (2**31))
    # mid-range pixels so shift in [-30, 30] can never wrap
    img = rng.randint(64, 192, (h, w, 3)).astype(np.uint8)
    shifted = (img.astype(np.int64) + shift).astype(np.uint8)
    assert _dhash_of_rgb_array(img) == _dhash_of_rgb_array(shifted)


@given(st.integers(min_value=1, max_value=30),
       st.integers(min_value=1, max_value=30),
       st.integers(min_value=0, max_value=2**31))
@settings(max_examples=25, deadline=None)
def test_jpeg_lossy_roundtrip_property(w, h, seed):
    """encode_jpeg_rgb → decode_jpeg_rgb on ARBITRARY RGB buffers:
    baseline JPEG with unit quantization tables is near-lossless —
    dims survive exactly and per-channel error is bounded by the
    DCT-coefficient rounding (observed ≤4; asserted ≤6 for float
    headroom). This pins decoder GENERALITY; the exact tier is the
    block-constant test below."""
    import numpy as np

    from incubator_hugegraph_spark.data.jpeg import (
        decode_jpeg_rgb, encode_jpeg_rgb)
    rng = np.random.RandomState(seed % (2**31))
    raw = rng.randint(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    got = decode_jpeg_rgb(encode_jpeg_rgb(raw, w, h))
    assert got is not None
    assert (got[0], got[1]) == (w, h)
    a = np.frombuffer(bytes(got[2]), dtype=np.uint8).astype(np.int64)
    b = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    assert np.abs(a - b).max() <= 6


@given(st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=4),
       st.integers(min_value=0, max_value=10_000))
@settings(max_examples=25, deadline=None)
def test_jpeg_block_constant_exact_property(bw, bh, asset_id):
    """The oracle's exactness hook (data/jpeg.py module docstring):
    for images CONSTANT GRAY per 8x8 block, the full baseline chain
    (BT.601 → FDCT → unit quant → Huffman → inverse everything) is
    EXACTLY invertible — render_media_jpeg's decoded pixels equal the
    generator formula bytes bit-for-bit."""
    import numpy as np

    from incubator_hugegraph_spark.data.jpeg import decode_jpeg_rgb
    from incubator_hugegraph_spark.data.multimodal import (
        render_media_jpeg, synth_media_bytes)
    got = decode_jpeg_rgb(render_media_jpeg(asset_id, bw, bh))
    assert got is not None
    w, h, out = got
    assert (w, h) == (bw * 8, bh * 8)
    vals = synth_media_bytes(asset_id, bw * bh).reshape(bh, bw)
    gray = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    want = np.stack([gray] * 3, axis=2).astype(np.uint8).tobytes()
    assert bytes(out) == want


@given(st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=4),
       st.integers(min_value=0, max_value=10_000),
       st.sampled_from(["4:2:0", "4:2:2"]),
       st.sampled_from([0, 2]))
@settings(max_examples=25, deadline=None)
def test_jpeg_subsampled_block_constant_exact_property(
        bw, bh, asset_id, ss, dri):
    """Subsampled JPEG exactness (r08): for block-constant GRAY
    images both chroma planes are the constant 128, whose box-mean
    downsample IS 128 and whose replication upsample returns 128 —
    so the 4:2:0/4:2:2 chain is exactly invertible on the same
    geometry the 4:4:4 oracle uses (Y rides at full resolution).
    Odd block counts exercise the MCU edge-padding path; dri=2
    exercises RSTn resync over multi-block MCUs."""
    import numpy as np

    from incubator_hugegraph_spark.data.jpeg import (
        decode_jpeg_rgb, encode_jpeg_rgb)
    from incubator_hugegraph_spark.data.multimodal import (
        synth_media_bytes)
    vals = synth_media_bytes(asset_id, bw * bh).reshape(bh, bw)
    gray = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    raw = np.stack([gray] * 3, axis=2).astype(np.uint8).tobytes()
    enc = encode_jpeg_rgb(raw, bw * 8, bh * 8, subsampling=ss,
                          restart_interval=dri)
    got = decode_jpeg_rgb(enc)
    assert got is not None
    assert (got[0], got[1]) == (bw * 8, bh * 8)
    assert bytes(got[2]) == raw


@given(st.integers(min_value=1, max_value=30),
       st.integers(min_value=1, max_value=30),
       st.integers(min_value=0, max_value=2**31))
@settings(max_examples=25, deadline=None)
def test_jpeg_subsampled_lossy_roundtrip_property(w, h, seed):
    """4:2:0 on ARBITRARY per-pixel GRAY buffers (r=g=b random, NOT
    block-constant): luma rides at full resolution and both chroma
    planes are the constant 128 (loss-free under box-mean +
    replication), so the roundtrip error equals the 4:4:4 bound —
    this pins decoder generality (every Huffman/AC/ZRL path, MCU
    edge padding, plane reassembly) without the genuinely-lossy
    chroma of saturated color noise, whose clamp interactions admit
    no useful bound. Dims survive exactly either way."""
    import numpy as np

    from incubator_hugegraph_spark.data.jpeg import (
        decode_jpeg_rgb, encode_jpeg_rgb)
    rng = np.random.RandomState(seed % (2**31))
    gray = rng.randint(0, 256, (h, w), dtype=np.uint8)
    raw = np.stack([gray] * 3, axis=2)
    got = decode_jpeg_rgb(
        encode_jpeg_rgb(raw.tobytes(), w, h, subsampling="4:2:0"))
    assert got is not None
    assert (got[0], got[1]) == (w, h)
    a = np.frombuffer(bytes(got[2]), dtype=np.uint8).astype(np.int64)
    assert np.abs(a - raw.ravel().astype(np.int64)).max() <= 6


@given(st.integers(min_value=1, max_value=4),
       st.integers(min_value=1, max_value=3),
       st.integers(min_value=0, max_value=2**31),
       st.sampled_from(["4:2:0", "4:2:2"]))
@settings(max_examples=25, deadline=None)
def test_jpeg_subsampled_color_geometry_property(tw, th, seed, ss):
    """Chroma-plane GEOMETRY pin with non-gray pixels (review r08:
    the gray properties keep Cb=Cr at a constant 128, so an axis swap
    in the box-mean reshape or the replication-upsample repeat would
    pass them unseen): random COLOR tiles constant per chroma block
    footprint (16x16 at 4:2:0, 16x8 at 4:2:2) make every plane
    constant per 8x8 block — DC-only, exactly carried — so the
    subsampled decode must be BYTE-IDENTICAL to the 4:4:4 decode of
    the same image; both share the one lossy step (BT.601 integer
    rounding). Non-square tile grids catch fy/fx and axis mixups at
    4:2:2's asymmetric factors."""
    import numpy as np

    from incubator_hugegraph_spark.data.jpeg import (
        SUBSAMPLING, decode_jpeg_rgb, encode_jpeg_rgb)
    rng = np.random.RandomState(seed % (2**31))
    hmax, vmax = SUBSAMPLING[ss][0]
    fw, fh = 8 * hmax, 8 * vmax   # chroma block footprint in pixels
    w, h = tw * fw, th * fh
    tiles = rng.randint(0, 256, (th, tw, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, fh, axis=0), fw, axis=1)
    raw = img.astype(np.uint8).tobytes()
    ref = decode_jpeg_rgb(encode_jpeg_rgb(raw, w, h))
    got = decode_jpeg_rgb(encode_jpeg_rgb(raw, w, h, subsampling=ss))
    assert got is not None and ref is not None
    assert (got[0], got[1]) == (w, h)
    assert bytes(got[2]) == bytes(ref[2])


@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=0, max_value=2**31))
@settings(max_examples=25, deadline=None)
def test_png_adam7_roundtrip_property(w, h, seed):
    """Adam7 interlaced PNG (r08): seven independent sub-images,
    each with its own scanline filter chain and fresh prior, scatter
    back to the exact original pixels — at every dims class
    (1..40 covers all empty-pass shapes: a 1-wide image has empty
    passes 2/4/6, a 1-tall image empty 3/5/7)."""
    import numpy as np

    from incubator_hugegraph_spark.data.multimodal import (
        decode_png_rgb, encode_png_rgb)
    rng = np.random.RandomState(seed % (2**31))
    raw = rng.randint(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    got = decode_png_rgb(encode_png_rgb(raw, w, h, interlace=True))
    assert got is not None
    assert (got[0], got[1]) == (w, h)
    assert bytes(got[2]) == raw


@given(st.integers(min_value=1, max_value=60),
       st.integers(min_value=1, max_value=60),
       st.integers(min_value=0, max_value=2**31))
@settings(max_examples=25, deadline=None)
def test_bmp_roundtrip_property(w, h, seed):
    """encode_bmp_rgb → decode_bmp_rgb is the IDENTITY on arbitrary
    RGB buffers (r08): the bottom-up row order, per-row 4-byte
    padding (w sweeps every stride class) and BGR↔RGB shuffle must
    all invert exactly."""
    import numpy as np

    from incubator_hugegraph_spark.data.multimodal import (
        decode_bmp_rgb, encode_bmp_rgb)
    rng = np.random.RandomState(seed % (2**31))
    raw = rng.randint(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    got = decode_bmp_rgb(encode_bmp_rgb(raw, w, h))
    assert got is not None
    assert (got[0], got[1]) == (w, h)
    assert bytes(got[2]) == raw


@given(st.integers(min_value=1, max_value=60),
       st.integers(min_value=1, max_value=60),
       st.integers(min_value=0, max_value=2**31))
@settings(max_examples=25, deadline=None)
def test_gif_roundtrip_property(w, h, seed):
    """encode_gif_gray → decode_gif_rgb is the IDENTITY on arbitrary
    grayscale buffers (GIF LZW is lossless): pixels replicate to RGB
    exactly. Covers variable code widths and dictionary growth up to
    ~3.6k entries; the 4096-entry re-clear and the width-boundary EOI
    cases live in test_data.test_gif_lzw_boundaries (review r07 —
    60x60 inputs can never reach the re-clear)."""
    import numpy as np

    from incubator_hugegraph_spark.data.gif import (
        decode_gif_rgb, encode_gif_gray)
    rng = np.random.RandomState(seed % (2**31))
    gray = rng.randint(0, 256, w * h, dtype=np.uint8).tobytes()
    got = decode_gif_rgb(encode_gif_gray(gray, w, h))
    assert got is not None
    assert (got[0], got[1]) == (w, h)
    want = np.repeat(np.frombuffer(gray, dtype=np.uint8), 3).tobytes()
    assert bytes(got[2]) == want


@given(st.integers(min_value=1, max_value=30),
       st.integers(min_value=1, max_value=30),
       st.integers(min_value=0, max_value=2**31),
       st.booleans(),
       st.sampled_from([0, 1, 3]))
@settings(max_examples=25, deadline=None)
def test_jpeg_progressive_equals_sequential_property(
        w, h, seed, ac_successive, dri):
    """PROGRESSIVE JPEG (r08 — SOF2 retired from the None-envelope):
    a full-script progressive stream accumulates the SAME quantized
    coefficients a sequential stream carries, so on ARBITRARY RGB
    buffers the two decodes must be byte-identical — pinning DC
    successive approximation (first + refinement bit), AC spectral
    selection with EOB runs, (ac_successive=True) the AC refinement
    path's newly-significant symbols, buffered correction bits and
    ZRL-with-corrections, and (dri>0) per-scan RSTn resync with DC
    predictor resets, against the long-established baseline decoder
    as the oracle."""
    import numpy as np

    from incubator_hugegraph_spark.data.jpeg import (
        decode_jpeg_rgb, encode_jpeg_rgb, encode_jpeg_rgb_progressive)
    rng = np.random.RandomState(seed % (2**31))
    raw = rng.randint(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    ref = decode_jpeg_rgb(encode_jpeg_rgb(raw, w, h))
    got = decode_jpeg_rgb(encode_jpeg_rgb_progressive(
        raw, w, h, ac_successive=ac_successive, restart_interval=dri))
    assert got is not None and ref is not None
    assert (got[0], got[1]) == (w, h)
    assert bytes(got[2]) == bytes(ref[2])


@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=0, max_value=2**31))
@settings(max_examples=25, deadline=None)
def test_gif_interlaced_roundtrip_property(w, h, seed):
    """INTERLACED GIF (r08 — the Appendix E boundary retired):
    encoding with the four-pass row order + interlace flag must
    decode back to the IDENTICAL display-order pixels as the
    non-interlaced stream — the deinterlace scatter is an exact
    permutation inverse, at every height class (1..40 covers all
    pass-boundary shapes: heights <2, <3, <5, <9 degenerate
    different passes to empty)."""
    import numpy as np

    from incubator_hugegraph_spark.data.gif import (
        decode_gif_rgb, encode_gif_gray)
    rng = np.random.RandomState(seed % (2**31))
    gray = rng.randint(0, 256, w * h, dtype=np.uint8).tobytes()
    enc = encode_gif_gray(gray, w, h, interlace=True)
    assert enc != encode_gif_gray(gray, w, h) or h == 1
    got = decode_gif_rgb(enc)
    assert got is not None
    assert (got[0], got[1]) == (w, h)
    want = np.repeat(np.frombuffer(gray, dtype=np.uint8), 3).tobytes()
    assert bytes(got[2]) == want

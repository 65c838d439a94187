"""Corpus-hygiene operators for training-data pipelines:
benchmark decontamination and duplication metrics.

Beyond-reference scope (no HugeGraph analog): these are the standard
pre-training corpus checks — "is any eval/benchmark text leaking into
the train split?" and "how internally duplicated is the corpus?" —
built on the same shingle-inverted-index kernel as
`data/dedup.py` (`word_shingles`), so the scale story is identical:
the join key is the shingle, only docs sharing a shingle ever meet,
and the hot-shingle worst case is bounded by dropping
ubiquitous shingles (`max_doc_frac`) before the pair join —
boilerplate n-grams carry no decontamination signal and are exactly
the quadratic-blowup keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubator_hugegraph_spark.data.dedup import word_shingles
from incubator_hugegraph_spark.functions.text import WS_SPLIT_RE


def decontaminate(train: DataFrame, bench: DataFrame, n: int = 3,
                  min_overlap: int = 2, max_doc_frac: float = 1.0,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Train↔benchmark contamination pairs by shared word n-grams.

    Returns (train_id, bench_id, overlap, overlap_frac):
    overlap = |distinct shared n-grams|, overlap_frac = overlap /
    |distinct benchmark-doc n-grams|, keeping pairs with
    overlap ≥ min_overlap. ``max_doc_frac`` < 1 drops shingles
    present in more than that fraction of train docs before the join
    (boilerplate carries no signal and is the quadratic hot key).
    """
    ts = word_shingles(train, n, text_col, id_col) \
        .select(F.col("id").alias("train_id"), "shingle")
    bs = word_shingles(bench, n, text_col, id_col) \
        .select(F.col("id").alias("bench_id"), "shingle")
    if max_doc_frac < 1.0:
        n_train = train.select(id_col).distinct().count()
        hot = (ts.groupBy("shingle")
               .agg(F.count(F.lit(1)).alias("df"))
               .filter(F.col("df") > max_doc_frac * n_train)
               .select("shingle"))
        ts = ts.join(hot, on="shingle", how="left_anti")
    bench_sz = bs.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_ngrams"))
    pairs = (ts.join(bs, on="shingle")
             .groupBy("train_id", "bench_id")
             .agg(F.count(F.lit(1)).alias("overlap"))
             .filter(F.col("overlap") >= min_overlap))
    return (pairs.join(bench_sz, on="bench_id")
            .select("train_id", "bench_id", "overlap",
                    F.round(F.col("overlap") / F.col("bench_ngrams"), 6)
                    .alias("overlap_frac")))


def dup_ngram_ratio(docs: DataFrame, n: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-doc corpus-duplication metric: the fraction of a doc's
    distinct word n-grams that also appear in at least one OTHER doc.

    Returns (id, n_ngrams, n_dup, dup_ratio); docs shorter than n
    tokens report 0 n-grams and ratio 0. One explode + one
    shingle-keyed aggregation + one per-doc aggregation — the same
    shuffle shape (keyed by shingle) as MinHash signatures, so the
    partitioning strategy that holds for dedup at scale holds here.
    """
    sh = word_shingles(docs, n, text_col, id_col)
    freq = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df"))  # rows are distinct per doc
    per_doc = (sh.join(freq, on="shingle")
               .groupBy("id")
               .agg(F.count(F.lit(1)).alias("n_ngrams"),
                    F.count(F.when(F.col("df") >= 2, F.lit(1)))
                    .alias("n_dup")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(per_doc, on="id", how="left")
            .select("id",
                    F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
                    F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
                    F.round(F.coalesce(F.col("n_dup")
                                       / F.col("n_ngrams"), F.lit(0.0)), 6)
                    .alias("dup_ratio")))


def repetition_metrics(docs: DataFrame, n: int = 2,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher-style intra-document repetition signals per doc
    (Rae et al. 2021 §A1.1 "repetition" filters, token-based):

    (id, n_ngrams, top_ngram_frac, dup_ngram_frac) where over the
    doc's word n-grams WITH multiplicity: top_ngram_frac = occurrences
    of the most frequent n-gram / total n-grams, dup_ngram_frac =
    fraction of n-gram instances whose n-gram occurs ≥ 2 times in the
    doc. Docs shorter than n tokens report 0 / 0.0 / 0.0.

    Shape: one explode + groupBy(id, shingle) + groupBy(id) — both
    aggregations partial-combine map-side and the key space is
    per-doc, so there is no hot key at any corpus size (the worst
    group is one document's n-gram multiset)."""
    sh = word_shingles(docs, n, text_col, id_col, distinct=False)
    per = (sh.groupBy("id", "shingle")
           .agg(F.count(F.lit(1)).alias("cnt"))
           .groupBy("id")
           .agg(F.sum("cnt").alias("n_ngrams"),
                F.max("cnt").alias("top_cnt"),
                F.sum(F.when(F.col("cnt") >= 2, F.col("cnt"))
                      .otherwise(F.lit(0))).alias("dup_cnt")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(per, on="id", how="left")
            .select("id",
                    F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
                    F.round(F.coalesce(F.col("top_cnt")
                                       / F.col("n_ngrams"), F.lit(0.0)), 6)
                    .alias("top_ngram_frac"),
                    F.round(F.coalesce(F.col("dup_cnt")
                                       / F.col("n_ngrams"), F.lit(0.0)), 6)
                    .alias("dup_ngram_frac")))


# PII patterns: conservative, Java/RE2-portable regexes (no lookbehind)
# so the same pattern strings run in Spark, DuckDB and most scrubbers.
# Dict order IS the redaction order — specific before general (the
# phone pattern would otherwise swallow IPv4/SSN spans first).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": (r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
             r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b"),
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
}


def pii_redact(docs: DataFrame, kinds: list[str] | None = None,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII scrub for training corpora: each matched span is
    replaced by `<KIND>` and counted. Returns
    (id, redacted, n_email, n_phone, … for the selected kinds).

    Entirely `regexp_replace`/`regexp_count` Column expressions —
    JVM-side inside whole-stage codegen, no Python in the row path,
    so the pass is a pure map over the corpus (no shuffle at any
    scale). Patterns are intentionally conservative (precision over
    recall): corpus policy usually layers a validator behind the
    regex gate; that validator slot is a pandas_udf hook, same shape
    as the analyzer plugin (SURVEY §2.K)."""
    kinds = kinds or list(PII_PATTERNS)
    # counts are taken SEQUENTIALLY on the progressively-redacted
    # text, so each count equals the number of <KIND> replacements
    # actually made — a span matching two patterns (an IPv4 that the
    # looser phone regex would also hit) is counted once, under the
    # kind that redacted it (code review r06: independent counts on
    # the original text overstated PII density)
    red = F.col(text_col)
    counts = []
    for k in kinds:
        counts.append(F.regexp_count(red, F.lit(PII_PATTERNS[k]))
                      .alias(f"n_{k}"))
        red = F.regexp_replace(red, PII_PATTERNS[k], f"<{k.upper()}>")
    return docs.select(F.col(id_col).alias("id"),
                       red.alias("redacted"), *counts)


def duplicated_spans(docs: DataFrame, n: int = 3, min_docs: int = 2,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Cross-document duplicated-span coverage (the exact-substring
    dedup signal of Lee et al., "Deduplicating Training Data Makes
    Language Models Better"): per doc, how much of the text is covered
    by token n-grams that also appear in ≥ ``min_docs`` documents.

    Returns (id, n_tokens, dup_spans, covered_tokens, dup_token_frac):
    dup_spans = duplicated n-gram START positions, covered_tokens =
    distinct token positions under any duplicated n-gram.

    Scale shape: positional shingles → doc-frequency filter →
    LEFT-SEMI join back on the shingle — row volume is the corpus
    token count, never a pair join, so hot boilerplate n-grams cannot
    go quadratic (they only mark more positions covered). All
    JVM-side Column expressions."""
    from incubator_hugegraph_spark.functions.text import tokenize
    toks = tokenize(F.col(text_col))
    sh = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    from incubator_hugegraph_spark.graph import checkpointed
    # pos_sh is consumed twice (df filter + semi-join back) and dpos
    # twice (starts + coverage) — checkpoint both so the corpus-token-
    # sized positional explode runs once, not ~4x (review r06; same
    # multi-consumer rule as ngram_jaccard_pairs' shingle table)
    pos_sh = checkpointed(
        docs.select(F.col(id_col).alias("id"),
                    F.posexplode(sh).alias("pos", "s")))
    dup_sh = (pos_sh.select("id", "s").distinct()
              .groupBy("s").agg(F.count(F.lit(1)).alias("df"))
              .filter(F.col("df") >= min_docs).select("s"))
    dpos = checkpointed(pos_sh.join(dup_sh, on="s", how="left_semi"))
    starts = dpos.groupBy("id").agg(
        F.countDistinct("pos").alias("dup_spans"))
    cov = (dpos.select("id", F.explode(
        F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("p"))
        .distinct()
        .groupBy("id").agg(F.count(F.lit(1)).alias("covered_tokens")))
    nt = docs.select(F.col(id_col).alias("id"),
                     F.size(toks).alias("n_tokens"))
    return (nt.join(starts, on="id", how="left")
            .join(cov, on="id", how="left")
            .select("id",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.coalesce("dup_spans", F.lit(0)).cast("long")
                    .alias("dup_spans"),
                    F.coalesce("covered_tokens", F.lit(0)).cast("long")
                    .alias("covered_tokens"),
                    F.when(F.col("n_tokens") == 0, F.lit(0.0))
                    .otherwise(F.round(
                        F.coalesce("covered_tokens", F.lit(0))
                        / F.col("n_tokens"), 6))
                    .alias("dup_token_frac")))


def dedup_substrings(docs: DataFrame, n: int = 3, min_docs: int = 2,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact-substring REMOVAL (the cut operation of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" —
    `duplicated_spans` is the measurement, this is the edit): every
    token position covered by an n-gram appearing in >= ``min_docs``
    distinct documents is removed from EVERY document; the surviving
    tokens reassemble in original order. Token-granularity ExactSubstr
    (the paper cuts at 50 BPE tokens; the n here is the same knob).

    Returns (id, clean_text, n_tokens, n_removed) — one row per doc,
    empty clean_text when everything was duplicated.

    Scale shape: positional shingles -> doc-frequency filter ->
    left-semi back on the shingle -> per-position anti-join -> per-doc
    array_sort reassembly. Row volume is the corpus token count at
    every stage; no pair join (hot boilerplate n-grams only mark more
    positions), no corpus-wide window or global sort (the reassembly
    sorts WITHIN each doc's collected struct array, exactly like
    dedup.paragraph_dedup)."""
    from incubator_hugegraph_spark.functions.text import tokenize
    from incubator_hugegraph_spark.graph import checkpointed
    toks = tokenize(F.col(text_col))
    sh = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    pos_sh = checkpointed(
        docs.select(F.col(id_col).alias("id"),
                    F.posexplode(sh).alias("pos", "s")))
    dup_sh = (pos_sh.select("id", "s").distinct()
              .groupBy("s").agg(F.count(F.lit(1)).alias("df"))
              .filter(F.col("df") >= min_docs).select("s"))
    covered = (pos_sh.join(dup_sh, on="s", how="left_semi")
               .select("id", F.explode(
                   F.sequence(F.col("pos"), F.col("pos") + (n - 1)))
                   .alias("p"))
               .distinct())
    tok_pos = docs.select(F.col(id_col).alias("id"),
                          F.posexplode(toks).alias("p", "tok"))
    kept = tok_pos.join(covered, on=["id", "p"], how="left_anti")
    rebuilt = (kept.groupBy("id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct(F.col("p"), F.col("tok")))),
                       lambda x: x["tok"]), " ").alias("clean_text"),
                   F.count(F.lit(1)).alias("n_kept")))
    nt = docs.select(F.col(id_col).alias("id"),
                     F.size(toks).cast("long").alias("n_tokens"))
    return (nt.join(rebuilt, on="id", how="left")
            .select("id",
                    F.coalesce("clean_text", F.lit("")).alias(
                        "clean_text"),
                    "n_tokens",
                    (F.col("n_tokens")
                     - F.coalesce("n_kept", F.lit(0)).cast("long"))
                    .alias("n_removed")))


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_rules(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 stop_words: tuple = GOPHER_STOPWORDS,
                 min_stop: int = 2) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 §A1.1 — the public
    filter set most large-corpus pipelines start from): word-count
    bounds, mean-word-length bounds, alpha-word fraction, bullet-/
    ellipsis-line ratios, stop-word presence, symbol (#) ratio.
    ``stop_words``/``min_stop`` default to the paper's set; pass a
    corpus-adapted set when the corpus vocabulary differs.

    Everything is ONE projection of Spark higher-order functions
    (split/filter/transform/aggregate) — JVM-side, codegen'd, zero
    Python round-trips, zero shuffles: at 100 TB this is a pure map
    riding the corpus scan. Returns one row per document with every
    metric and per-rule booleans plus the conjunction ``keep`` so
    downstream filters can relax individual rules without
    recomputing."""
    words = F.filter(F.split(F.col(text_col), WS_SPLIT_RE),
                     lambda x: x != "")
    lines = F.filter(F.split(F.col(text_col), "\n"),
                     lambda x: F.trim(x) != "")
    n_words = F.size(words)
    n_lines = F.size(lines)

    # ANSI-safe division: empty/whitespace-only documents have
    # n_words == 0 (and possibly n_lines == 0) — under Spark 4's
    # default ANSI mode a bare x/0 would abort the whole corpus pass
    # with DIVIDE_BY_ZERO (code review r06). NULL metrics flow into
    # the rule booleans, which coalesce to False: junk docs are
    # FILTERED, never fatal.
    def _per(num, den):
        return F.when(den > 0, num / den)

    total_len = F.aggregate(
        F.transform(words, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"), lambda a, x: a + x)
    mean_len = _per(total_len.cast("double"), n_words)
    alpha_frac = _per(F.size(F.filter(words,
                                      lambda x: x.rlike("[A-Za-z]")))
                      .cast("double"), n_words)
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(F.transform(words, F.lower)),
        F.array(*[F.lit(w) for w in stop_words])))
    bullet_frac = _per(F.size(F.filter(
        lines,
        lambda x: F.trim(x).startswith("-") | F.trim(x).startswith("*")
        | F.trim(x).startswith("\u2022")))
        .cast("double"), n_lines)
    ellipsis_frac = _per(F.size(F.filter(
        lines, lambda x: F.trim(x).endswith("...")))
        .cast("double"), n_lines)
    hash_ratio = _per((F.length(text_col)
                       - F.length(F.regexp_replace(text_col, "#", "")))
                      .cast("double"), n_words)
    m = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(hash_ratio, 6).alias("hash_ratio"))
    rules = {
        "r_word_count": (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000),
        "r_mean_len": (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10),
        "r_alpha": F.col("alpha_frac") >= 0.80,
        "r_stop": F.col("stop_hits") >= min_stop,
        "r_bullet": F.col("bullet_frac") <= 0.90,
        "r_ellipsis": F.col("ellipsis_frac") <= 0.30,
        "r_symbol": F.col("hash_ratio") <= 0.10,
    }
    for name, cond in rules.items():
        m = m.withColumn(name, F.coalesce(cond, F.lit(False)))
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return m.withColumn("keep", keep)


def c4_clean(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", min_words_per_line: int = 5,
             min_sentences: int = 3) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2 — the public
    rule set behind the C4 corpus): keep only lines that end in a
    terminal punctuation mark (``. ! ? "``), have at least
    ``min_words_per_line`` words, and don't mention "javascript";
    drop whole pages containing "lorem ipsum" or a curly brace, or
    whose cleaned text has fewer than ``min_sentences`` sentences
    (terminal-punct count). Complements `gopher_rules` (word-level
    stats) with C4's line-level pass; the 3-sentence-span dedup C4
    also does is `duplicated_spans`.

    One projection of higher-order functions — JVM-side, codegen'd,
    zero shuffles: a pure map riding the corpus scan at 100 TB.

    Returns (id, n_lines, n_kept, n_sent, has_lorem, has_brace,
    keep, cleaned_md5, cleaned).
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), F.trim),
        lambda x: x != "")

    def keep_line(x):
        words = F.filter(F.split(x, WS_SPLIT_RE), lambda w: w != "")
        return (x.rlike('[.!?"]$')
                & (F.size(words) >= min_words_per_line)
                & ~F.lower(x).contains("javascript"))

    kept = F.filter(lines, keep_line)
    cleaned = F.array_join(kept, "\n")
    n_sent = (F.length(cleaned)
              - F.length(F.regexp_replace(cleaned, "[.!?]", ""))) \
        .cast("long")
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    return docs.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        n_sent.alias("n_sent"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (~has_lorem & ~has_brace
         & (n_sent >= min_sentences)).alias("keep"),
        F.md5(cleaned).alias("cleaned_md5"),
        cleaned.alias("cleaned"))


def source_overlap(docs: DataFrame, n: int = 3, text_col: str = "text",
                   group_col: str = "source") -> DataFrame:
    """Pairwise n-gram Jaccard between corpus SLICES (sources /
    domains / snapshots): the redundancy-contamination matrix a
    corpus audit runs before mixing sources into a training set.

    Returns (src_a, src_b, inter, jaccard) for src_a < src_b, where
    inter = |shared distinct n-grams| and jaccard = inter / |union|.

    Scale shape: the only corpus-sized intermediate is the DISTINCT
    (slice, gram) table (one scan + one dedup shuffle); the inverted
    self-join fans out ≤ slices² rows PER GRAM (slices are few) and
    aggregates map-side; the size table is |slices| rows → broadcast
    into the final ratio."""
    from incubator_hugegraph_spark.graph import checkpointed
    # consumed three times (both join sides + the size table):
    # materialize the distinct-gram table once — same reasoning (and
    # measured win) as ngram_jaccard_pairs in dedup.py
    g = checkpointed(word_shingles(docs, n, text_col, id_col=group_col))
    sizes = g.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (g.select(F.col("id").alias("src_a"), "shingle")
             .join(g.select(F.col("id").alias("src_b"), "shingle"),
                   on="shingle")
             .filter(F.col("src_a") < F.col("src_b"))
             .groupBy("src_a", "src_b")
             .agg(F.count(F.lit(1)).alias("inter")))
    return (pairs
            .join(F.broadcast(sizes.select(F.col("id").alias("src_a"),
                                           F.col("sz").alias("sa"))),
                  on="src_a")
            .join(F.broadcast(sizes.select(F.col("id").alias("src_b"),
                                           F.col("sz").alias("sb"))),
                  on="src_b")
            .select("src_a", "src_b", "inter",
                    F.round(F.col("inter")
                            / (F.col("sa") + F.col("sb")
                               - F.col("inter")), 6).alias("jaccard")))

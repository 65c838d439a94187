"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, fingerprinting.

Every function is a pure Column program (JVM codegen, zero Python in
the row path) with an exact SQL mirror declared in the oracle — the
heuristics are deliberately simple and specified, since parity (not
model quality) is what a data pipeline needs to be reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incubator_hugegraph_spark.data.dedup import normalize_text
from incubator_hugegraph_spark.functions.text import (WS_SPLIT_RE,
                                                      token_count,
                                                      tokenize)

# language-ID: stopword hit counts (with duplicates) + CJK detection;
# winner = max count, ties → alphabetically first, no hits → 'und'
STOPWORDS = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "en": ["the", "of", "and", "a", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "los"],
    "fr": ["le", "la", "et", "les", "des", "un", "une"],
}
CJK_RE = r"[一-鿿]"


def _stop_hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(id, lang): heuristic n-gram/stopword language ID. 'zh' wins if
    any CJK character is present."""
    toks = tokenize(F.col(text_col))
    scores = [(lang, _stop_hits(toks, ws)) for lang, ws in
              sorted(STOPWORDS.items())]
    # argmax with alphabetical tie-break: fold over sorted langs, strict >
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, sc in scores:
        cond = sc > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, sc).otherwise(best_score)
    out = F.when(F.col(text_col).rlike(CJK_RE), F.lit("zh")) \
        .otherwise(best_lang)
    return docs.select(F.col(id_col).alias("id"), out.alias("lang"))


# SQL mirror of lang_id for the DuckDB oracle (same fold order)
def lang_id_sql(text: str = "text", id_: str = "doc_id") -> str:
    tok = (f"list_filter(string_split_regex(lower({text}), '[^a-z0-9]+'), "
           "x -> x <> '')")
    parts = []
    for lang, ws in sorted(STOPWORDS.items()):
        arr = "[" + ",".join(f"'{w}'" for w in ws) + "]"
        parts.append(
            f"len(list_filter({tok}, t -> list_contains({arr}, t))) "
            f"AS s_{lang}")
    score_sel = ", ".join(parts)
    fold = "'und'"
    prev = "0"
    for lang in sorted(STOPWORDS):
        fold = f"CASE WHEN s_{lang} > {prev} THEN '{lang}' " \
               f"ELSE {fold} END"
        prev = f"greatest({prev}, s_{lang})"
    return f"""
SELECT {id_} AS id,
       CASE WHEN regexp_matches({text}, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
            ELSE {fold} END AS lang
FROM (SELECT {id_}, {text}, {score_sel} FROM documents)
"""


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, alpha_ratio, stopword_ratio, mean_token_len,
    quality): length/stopword/character heuristics. quality =
    0.4·min(n_tokens/50,1) + 0.3·alpha_ratio + 0.3·min(stop·5,1),
    all rounded 6."""
    toks = tokenize(F.col(text_col))
    n_tok = F.size(toks)
    total_len = F.length(F.col(text_col))
    alpha_len = F.length(F.regexp_replace(F.col(text_col),
                                          r"[^A-Za-z]", ""))
    stops = _stop_hits(toks, STOPWORDS["en"])
    # ANSI-safe: an empty doc (total_len 0) or one with no tokens
    # ('!!!') must SCORE ZERO, not abort the corpus pass with
    # DIVIDE_BY_ZERO (code review r06 — Spark 4 ANSI default)
    alpha_ratio = F.when(total_len > 0,
                         alpha_len / total_len).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stops / n_tok).otherwise(F.lit(0.0))
    mean_tok = F.when(n_tok > 0,
                      F.aggregate(toks, F.lit(0),
                                  lambda acc, t: acc + F.length(t))
                      / n_tok).otherwise(F.lit(0.0))
    quality = (0.4 * F.least(n_tok / F.lit(50.0), F.lit(1.0))
               + 0.3 * alpha_ratio
               + 0.3 * F.least(stop_ratio * 5, F.lit(1.0)))
    return docs.select(
        F.col(id_col).alias("id"),
        n_tok.alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(quality, 6).alias("quality"))


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_distinct, n_chars): whitespace/punct-split
    token counting (the BPE-ish regex analyzer default)."""
    toks = tokenize(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length(F.col(text_col)).alias("n_chars"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, fp): document fingerprint = md5 of the normalized token
    stream (whitespace/case/punct-insensitive identity). A
    rolling-hash winnowing variant would pick min-hashes of shingle
    windows — that selection lives in dedup.minhash_signatures."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.md5(normalize_text(text_col)).alias("fp"))


def search_rank(docs: DataFrame, words: list[str],
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Analyzer-backed SEARCH-index match with relevance count —
    the ranked form of the reference's full-text lookup
    (GraphIndexTransaction.doSearchIndex, core/backend/tx/
    GraphIndexTransaction.java:529-548: query words are analyzer
    tokens, a document matches on any word; we additionally expose
    HOW MANY distinct query words matched, the natural ordering the
    index gives for free). Pure Column program — the token
    set/intersect runs in codegen; no shuffle at all (scan → filter
    → project)."""
    # the QUERY runs through the same analyzer as the documents
    # (reference doSearchIndex parity; review r06 — 'Spark' or a
    # multi-word query silently matched nothing against lowercased
    # single tokens)
    import re as _re
    qtoks = sorted({t for w in words
                    for t in _re.split(r"[^a-z0-9]+", w.lower()) if t})
    qarr = F.array(*[F.lit(w) for w in qtoks])
    toks = F.array_distinct(tokenize(F.col(text_col)))
    matches = F.size(F.array_intersect(toks, qarr))
    return (docs.select(F.col(id_col).alias("id"),
                        matches.alias("matches"))
            .filter(F.col("matches") > 0))


def tfidf_top_terms(docs: DataFrame, top: int = 3,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-N TF-IDF terms per document: tokenize → per-(doc,term)
    counts → document frequency → tf·ln(N/df) → window top-N by
    (rounded score desc, term asc). Two shuffles (doc-term counts,
    term df) + one window; df table is an aggregate, broadcastable.
    Rounding-before-ranking keeps the ordering identical between
    Spark and the DuckDB oracle under ulp noise."""
    toks = docs.select(F.col(id_col).alias("id"),
                       F.explode(tokenize(F.col(text_col))).alias("term"))
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.col(id_col)).distinct().count()
    # df is vocabulary-bound (Zipf) — broadcast it so the hot
    # stopword keys ride the tf shuffle map-side instead of piling
    # one corpus-scale key into a single sort-merge task (review r06)
    scored = (tf.join(F.broadcast(dfreq), on="term")
              .withColumn("score", F.round(
                  F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")),
                  6)))
    from pyspark.sql.window import Window
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= top)
            .select("id", "term", "score"))


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level curation dashboard row: doc count, token totals
    and the token-length distribution (exact interpolated
    percentiles — Spark `percentile`, mirrored by DuckDB
    quantile_cont double-for-double). One aggregation pass; the
    percentile is the only non-sketch piece and swaps for
    approx_percentile at the 100 TB tier (documented tradeoff)."""
    t = docs.select(token_count(F.col(text_col)).alias("n"))
    return t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").alias("total_tokens"),
        F.round(F.avg("n"), 6).alias("mean_tokens"),
        F.expr("percentile(n, 0.5)").alias("p50_tokens"),
        F.expr("percentile(n, 0.95)").alias("p95_tokens"))


def ngram_lm_score(docs: DataFrame, model_docs: DataFrame | None = None,
                   k: float = 0.1, text_col: str = "text",
                   id_col: str = "doc_id",
                   broadcast_model: bool = True) -> DataFrame:
    """Corpus-trained bigram language-model score per document —
    the CCNet-style quality signal (Wenzek et al. 2020 train a KenLM
    and bucket documents by perplexity; this is the same shape with
    an exactly-specified in-Spark model, so the score is reproducible
    without an external binary).

    Model: add-k-smoothed bigram LM over ``model_docs`` (defaults to
    ``docs`` — self-scoring):  P(w2|w1) = (c(w1 w2) + k) /
    (c(w1) + k·V),  V = vocabulary size. Tokens are lowercased
    whitespace splits. Per document: mean log-prob over its bigrams
    and perplexity exp(−mean); docs with < 2 tokens have no bigrams
    and drop out (no probability mass to score).

    Scale: the model tables are VOCABULARY-bound (Zipf), not
    corpus-bound — unigrams |V|, bigrams ≤ observed pair types — so
    at 100 TB they broadcast (``broadcast_model``, default) and
    scoring is a map-side join riding the corpus scan plus one
    per-doc aggregation shuffle; set ``broadcast_model=False`` for
    pathological vocabularies and both joins fall back to shuffles
    on the token key.
    """
    model_docs = docs if model_docs is None else model_docs

    def toks(c: Column) -> Column:
        return F.filter(F.split(F.lower(c), WS_SPLIT_RE),
                        lambda x: x != "")

    def bigrams(ws: Column) -> Column:
        n = F.size(ws)
        return F.when(n >= 2, F.zip_with(
            F.slice(ws, 1, n - 1), F.slice(ws, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))) \
            .otherwise(F.array().cast(
                "array<struct<w1:string,w2:string>>"))

    from incubator_hugegraph_spark.graph import checkpointed
    mtoks = model_docs.select(toks(F.col(text_col)).alias("ws"))
    # the model tables are consumed multiple times (vocab count + the
    # scoring joins) — checkpoint them so the corpus-wide tokenize/
    # explode/groupBy model pass runs ONCE, not three times (review
    # r06; they are vocabulary-bound, so the materialization is small)
    uni = checkpointed(
        mtoks.select(F.explode("ws").alias("w1"))
        .groupBy("w1").agg(F.count(F.lit(1)).alias("c1")))
    big = checkpointed(
        mtoks.select(F.explode(bigrams(F.col("ws"))).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2")))
    vocab = uni.count()

    if broadcast_model:
        uni, big = F.broadcast(uni), F.broadcast(big)
    scored = (docs.select(F.col(id_col),
                          F.explode(bigrams(toks(F.col(text_col))))
                          .alias("b"))
              .select(id_col, "b.w1", "b.w2")
              .join(big, on=["w1", "w2"], how="left")
              .join(uni, on="w1", how="left")
              .select(F.col(id_col), (
                  F.log((F.coalesce(F.col("c2"), F.lit(0)) + k)
                        / (F.coalesce(F.col("c1"), F.lit(0))
                           + k * vocab))).alias("logp")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg("logp"), 6).alias("avg_logp"),
                 F.round(F.exp(-F.avg("logp")), 4).alias("ppl")))


def bpe_pair_counts(docs: DataFrame, top: int = 20,
                    text_col: str = "text") -> DataFrame:
    """One BPE merge round (Sennrich et al. 2016, the public byte-pair
    -encoding algorithm): adjacent character-pair frequencies weighted
    by corpus word frequency — the top pair is the next merge rule.
    Returns the top-``top`` candidates as (pair, cnt), ordered count
    desc then pair asc (deterministic, oracle-checkable).

    Scale shape: the corpus is scanned ONCE (tokenize → explode →
    word groupBy with map-side partial aggregation); every later step
    runs on the DISTINCT-WORD table (vocabulary-sized, not
    corpus-sized) and the final aggregation has ≤ alphabet² groups."""
    words = docs.select(F.explode(tokenize(F.col(text_col))).alias("w"))
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    pairs = (wc.filter(F.length("w") >= 2)
             .select(F.explode(F.expr(
                 "transform(sequence(1, length(w)-1), "
                 "i -> substring(w, i, 2))")).alias("pair"),
                 F.col("c")))
    return (pairs.groupBy("pair").agg(F.sum("c").alias("cnt"))
            .orderBy(F.desc("cnt"), "pair").limit(top))


def vocab_coverage(docs: DataFrame, vocab_size: int = 500,
                   text_col: str = "text",
                   group_col: str = "source") -> DataFrame:
    """Per-slice token coverage of the corpus-global top-N word
    vocabulary — the OOV-rate complement a size-N tokenizer vocab
    would see on each ``group_col`` slice. Vocabulary = top-N words
    by count (ties broken alphabetically).

    The vocab is N-bounded → broadcast; coverage scoring is a
    map-side hash join riding the token stream, so the only
    corpus-sized shuffles are the two aggregations (word counts,
    per-group totals), both map-side-combined."""
    toks = docs.select(F.col(group_col).alias("grp"),
                       F.explode(tokenize(F.col(text_col))).alias("w"))
    vocab = (toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
             .orderBy(F.desc("c"), "w").limit(vocab_size)
             .select("w", F.lit(1).alias("__v")))
    return (toks.join(F.broadcast(vocab), on="w", how="left")
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("total_tokens"),
                 F.count("__v").alias("covered_tokens"))
            .select(F.col("grp").alias(group_col),
                    "total_tokens", "covered_tokens",
                    F.round(F.col("covered_tokens")
                            / F.col("total_tokens"), 6)
                    .alias("coverage")))


def bpe_train(docs: DataFrame, n_merges: int = 10,
              text_col: str = "text") -> tuple[list, DataFrame]:
    """Full BPE training (Sennrich et al. 2016): learn ``n_merges``
    merge rules over the corpus. Returns (merges, vocab_df) where
    merges = [(left, right), …] in learned order and vocab_df =
    (word, c, symbols) — the final segmentation of every distinct
    word.

    Distribution contract: the CORPUS is touched exactly once (the
    word-count aggregation); the merge loop runs on the DISTINCT-WORD
    table, which is vocabulary-sized. Pair counting each round is a
    JVM Column program (transform+explode+sum); picking the top pair
    collects ONE row; applying a merge is a left-fold over each
    word's symbol array (F.aggregate — still JVM codegen, no Python
    in the loop). localCheckpoint every few rounds cuts the growing
    lineage, the same discipline as the iterative graph algorithms."""
    from incubator_hugegraph_spark.graph import checkpointed
    wc = (docs.select(F.explode(tokenize(F.col(text_col))).alias("w"))
          .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
          .select("w", "c", F.split("w", "").alias("symbols")))
    # split('', '') yields a trailing empty string on some Spark
    # versions — normalize defensively
    wc = wc.withColumn(
        "symbols", F.filter("symbols", lambda s: s != ""))
    wc = checkpointed(wc)

    def pair_counts(t: DataFrame) -> DataFrame:
        pairs = F.when(
            F.size("symbols") >= 2,
            F.zip_with(F.slice("symbols", 1, F.size("symbols") - 1),
                       F.slice("symbols", 2, F.size("symbols") - 1),
                       lambda a, b: F.struct(a.alias("l"), b.alias("r")))
        ).otherwise(F.array().cast(
            "array<struct<l:string,r:string>>"))
        return (t.select(F.explode(pairs).alias("p"), "c")
                .groupBy("p.l", "p.r").agg(F.sum("c").alias("cnt")))

    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (pair_counts(wc)
               .orderBy(F.desc("cnt"), "l", "r").limit(1).collect())
        if not top or top[0]["cnt"] < 2:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        # left-fold: append each symbol, merging when the accumulator
        # tail is `left` and the incoming symbol is `right`
        merged = F.aggregate(
            "symbols",
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == left) & (s == right),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(left + right)))
            ).otherwise(F.concat(acc, F.array(s))))
        wc = wc.withColumn("symbols", merged)
        if (i + 1) % 4 == 0:
            wc = checkpointed(wc)  # lineage cut, vocab-sized
    return merges, wc


def ccnet_buckets(docs: DataFrame, model_docs: DataFrame | None = None,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): documents
    split head / middle / tail by the corpus distribution of their
    LM score — terciles of mean bigram log-prob (higher = more
    fluent = head). Returns (id, avg_logp, ppl, bucket).

    Scale shape: scoring is the ngram_lm_score program (model tables
    broadcast, one per-doc aggregation); the two tercile cutoffs are
    ONE exact-percentile global aggregate whose result is two scalars
    — no global sort and no ntile window over the corpus."""
    from incubator_hugegraph_spark.graph import checkpointed

    # the scored table is consumed TWICE — once eagerly for the
    # tercile cuts, once in the returned plan; without the checkpoint
    # the whole bigram-LM pipeline (two corpus-wide model aggregates)
    # executes per consumer (code review r06 — same multi-consumer
    # rule as dedup.py/clean.py)
    scored = checkpointed(ngram_lm_score(docs, model_docs,
                                         text_col=text_col,
                                         id_col=id_col))
    # double literals, not 1.0/3.0: Spark SQL parses 1.0 as DECIMAL
    # and percentile() requires a foldable DOUBLE array; the repr'd
    # doubles are also exactly what DuckDB's 1.0/3.0 evaluates to
    cuts = scored.agg(F.expr(
        f"percentile(avg_logp, array({1 / 3!r}D, {2 / 3!r}D))")
        .alias("c")).head()["c"]
    if cuts is None:
        # no scorable docs (every doc < 2 tokens, or empty corpus):
        # empty result with the declared schema, not a TypeError on
        # the NULL percentile (review r06)
        return scored.select(id_col, "avg_logp", "ppl",
                             F.lit("tail").alias("bucket")).limit(0)
    lo, hi = float(cuts[0]), float(cuts[1])
    bucket = (F.when(F.col("avg_logp") >= hi, F.lit("head"))
              .when(F.col("avg_logp") >= lo, F.lit("middle"))
              .otherwise(F.lit("tail")))
    return scored.select(id_col, "avg_logp", "ppl",
                         bucket.alias("bucket"))

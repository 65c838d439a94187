"""Text analyzers + text-analysis functions.

The reference ships 8 pluggable word-segmentation analyzers for its
SEARCH index (core/analyzer/*.java, AnalyzerFactory.java; interface
Analyzer.java:24 ``segment()``). Our default analyzer is a
lowercasing non-alphanumeric split — declared in every DuckDB oracle
so both sides agree. CJK-capable analyzers would plug in as a
pandas_udf behind the same ``tokenize`` signature.

All functions here are pure Column expressions (JVM-side, inside
whole-stage codegen) — no Python row loop anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"[^a-z0-9]+"

# Whitespace-split regex shared by every \s-style splitter AND its
# DuckDB oracle twin: Java's \s includes vertical tab (U+000B) while
# RE2's does not, so the implicit class silently diverged the engines
# on VT-containing text (text-tier review r06). One explicit class,
# identical bytes on both sides.
WS_SPLIT_RE = r"[ \t\n\r\f\x0B]+"



def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col: Column | str) -> Column:
    """lower → split on non-alphanumeric runs → drop empties."""
    toks = F.split(F.lower(_c(col)), TOKEN_SPLIT_RE)
    return F.filter(toks, lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokenize(col)))


# --------------------------------------------------------------------
# Analyzer plugin registry — AnalyzerFactory.java / Analyzer.java:24
# (``segment()``). The reference ships 8 JVM segmenters (Ansj, HanLP,
# IK, Jcseg, Jieba, MMSeg4J, SmartCN, word); ours are callables
# Column -> Column(array<string>). Column-expression analyzers stay
# inside whole-stage codegen; heavyweight/CJK segmenters register a
# pandas_udf behind the same signature (Arrow-batched — never a
# row-at-a-time Python UDF).
# --------------------------------------------------------------------
_ANALYZERS: dict[str, object] = {}


def register_analyzer(name: str, fn) -> None:
    """Register a tokenizer: fn(Column) -> Column(array<string>)."""
    _ANALYZERS[name] = fn


def analyzer(name: str):
    try:
        return _ANALYZERS[name]
    except KeyError:
        raise ValueError(
            f"unknown analyzer {name!r}; registered: "
            f"{sorted(_ANALYZERS)}") from None


def segment(col: Column | str, name: str = "word") -> Column:
    """Tokenize ``col`` with the named analyzer (reference:
    Analyzer.segment)."""
    return analyzer(name)(_c(col))


def _bigram_analyzer(col: Column) -> Column:
    """Character-bigram segmentation — the standard CJK fallback when
    no dictionary segmenter is available (and a stand-in showing how a
    pandas_udf analyzer plugs in). Pure Column expressions here since
    bigrams don't need Python."""
    s = F.regexp_replace(F.lower(col), r"\s+", "")
    n = F.length(s)
    return F.when(n < 2, F.array(s)).otherwise(
        F.transform(F.sequence(F.lit(1), n - 1),
                    lambda i: s.substr(i, F.lit(2))))


# --------------------------------------------------------------------
# Dictionary-driven CJK segmenter (forward maximum matching) — the
# algorithm family behind the reference's IK / MMSeg4J / Jieba
# analyzers (core/analyzer/AnalyzerFactory.java ships 8 JVM
# segmenters; none of those libraries exist in this environment, so
# the segmenter itself is implemented here). Arrow-batched pandas_udf
# behind the same ``segment()`` signature — never a row-at-a-time
# Python UDF. The scan→segment pass is a pure map (no shuffle), so it
# scales linearly with the corpus.
# --------------------------------------------------------------------

#: Small built-in lexicon (analytics-domain vocabulary). Real corpora
#: pass their own dictionary to make_fmm_analyzer.
DEFAULT_CJK_DICT: frozenset[str] = frozenset({
    "数据", "数据库", "分布", "分布式", "系统", "分布式系统",
    "图", "计算", "图计算", "机器", "学习", "机器学习",
    "查询", "引擎", "查询引擎", "索引", "分析", "算法", "模型",
    "的", "和", "与",
})


def _is_cjk(ch: str) -> bool:
    o = ord(ch)
    return (0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF
            or 0xF900 <= o <= 0xFAFF)


def _fmm_segment(text: str, words: frozenset[str], maxlen: int) \
        -> list[str]:
    """Forward maximum matching: at each CJK position take the longest
    dictionary word, else the single character. Non-CJK runs fall back
    to the default word rule (lowercase alnum runs) so mixed-script
    text tokenizes consistently with the 'word' analyzer."""
    out: list[str] = []
    i, n = 0, len(text)
    buf: list[str] = []  # current non-CJK alnum run

    def flush() -> None:
        if buf:
            out.append("".join(buf))
            buf.clear()

    while i < n:
        ch = text[i]
        if _is_cjk(ch):
            flush()
            for ln in range(min(maxlen, n - i), 1, -1):
                if text[i:i + ln] in words:
                    out.append(text[i:i + ln])
                    i += ln
                    break
            else:
                out.append(ch)
                i += 1
            continue
        low = ch.lower()
        if low.isascii() and (low.isalpha() or low.isdigit()):
            buf.append(low)
        else:
            flush()
        i += 1
    flush()
    return out


def _rmm_segment(text: str, words: frozenset[str], maxlen: int) \
        -> list[str]:
    """Reverse (backward) maximum matching — scans right-to-left,
    preferring the longest dictionary word ENDING at each position
    (the classic RMM pass of MMSeg-style segmenters)."""
    out: list[str] = []
    i = len(text)
    buf: list[str] = []  # reversed non-CJK alnum run

    def flush() -> None:
        if buf:
            out.append("".join(reversed(buf)))
            buf.clear()

    while i > 0:
        ch = text[i - 1]
        if _is_cjk(ch):
            flush()
            for ln in range(min(maxlen, i), 1, -1):
                if text[i - ln:i] in words:
                    out.append(text[i - ln:i])
                    i -= ln
                    break
            else:
                out.append(ch)
                i -= 1
            continue
        low = ch.lower()
        if low.isascii() and (low.isalpha() or low.isdigit()):
            buf.append(low)
        else:
            flush()
        i -= 1
    flush()
    return list(reversed(out))


def _bimm_segment(text: str, words: frozenset[str], maxlen: int) \
        -> list[str]:
    """Bi-directional maximum matching: run FMM and RMM, keep the
    segmentation with fewer tokens; on a tie prefer the one with
    fewer single-character tokens, then RMM (the conventional
    disambiguation rule)."""
    f = _fmm_segment(text, words, maxlen)
    r = _rmm_segment(text, words, maxlen)
    if len(f) != len(r):
        return f if len(f) < len(r) else r
    f1 = sum(1 for t in f if len(t) == 1)
    r1 = sum(1 for t in r if len(t) == 1)
    return f if f1 < r1 else r


def _dag_segment(text: str, words: frozenset[str], maxlen: int,
                 freqs: dict[str, int] | None = None) -> list[str]:
    """Jieba-style DAG / unigram-cost segmentation (the algorithm of
    the reference's JiebaAnalyzer slot, core/analyzer/JiebaAnalyzer):
    build the word DAG over each CJK run (every dictionary word
    starting at each position, plus the single character), then pick
    the max-log-probability path by right-to-left DP. Unknown single
    characters get a tiny OOV frequency — exactly the property that
    separates DAG from greedy FMM: on 研究生命起源 with
    {研究, 研究生, 生命, 起源}, FMM grabs 研究生 and strands an OOV
    命, while the DP prefers the all-known 研究|生命|起源 path.
    Non-CJK runs tokenize with the shared word rule (FMM kernel with
    an empty lexicon degenerates to it)."""
    freqs = freqs or {}
    total = max(2, sum(freqs.values()) or len(words) + 1)
    log_total = math.log(total)
    oov_cost = math.log(0.5) - log_total  # < any real word's logprob

    def run_dp(s: str) -> list[str]:
        m = len(s)
        route = [0.0] * (m + 1)
        choice = [1] * m
        for i in range(m - 1, -1, -1):
            best_c, best_ln = None, 1
            for ln in range(1, min(maxlen, m - i) + 1):
                w = s[i:i + ln]
                if ln > 1 and w not in words:
                    continue
                if ln == 1 and w not in words:
                    lp = oov_cost
                else:
                    lp = math.log(freqs.get(w, 1)) - log_total
                c = lp + route[i + ln]
                # maximize; tie → longer word (deterministic)
                if best_c is None or c > best_c or \
                        (c == best_c and ln > best_ln):
                    best_c, best_ln = c, ln
            route[i] = best_c
            choice[i] = best_ln
        out, i = [], 0
        while i < m:
            out.append(s[i:i + choice[i]])
            i += choice[i]
        return out

    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        j = i
        if _is_cjk(text[i]):
            while j < n and _is_cjk(text[j]):
                j += 1
            out.extend(run_dp(text[i:j]))
        else:
            while j < n and not _is_cjk(text[j]):
                j += 1
            out.extend(_fmm_segment(text[i:j], frozenset(), 1))
        i = j
    return out


def make_fmm_analyzer(dictionary=DEFAULT_CJK_DICT, kernel=None):
    """Build a Column->Column analyzer segmenting with forward maximum
    matching over ``dictionary`` (registerable via register_analyzer).
    ``kernel`` swaps the segmentation function (RMM/BiMM below reuse
    this factory)."""
    words = frozenset(dictionary)
    maxlen = max(map(len, words)) if words else 1
    seg_fn = kernel or _fmm_segment

    def _analyzer(col: Column) -> Column:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def seg(s):  # pd.Series[str] -> pd.Series[list[str]]
            return s.map(lambda t: [] if t is None
                         else seg_fn(t, words, maxlen))
        return seg(_c(col))
    return _analyzer


def make_rmm_analyzer(dictionary=DEFAULT_CJK_DICT):
    return make_fmm_analyzer(dictionary, kernel=_rmm_segment)


def make_bimm_analyzer(dictionary=DEFAULT_CJK_DICT):
    return make_fmm_analyzer(dictionary, kernel=_bimm_segment)


# ---------------------------------------------------------------------
# HMM finalseg (the second half of the Jieba algorithm,
# jieba/finalseg): runs of out-of-vocabulary characters left as
# singles by the DAG pass are re-segmented by Viterbi over the BMES
# state machine (Begin/Middle/End/Single). Parameters are pluggable —
# real deployments drop in trained per-character emission tables; the
# defaults are emission-uniform, which reduces Viterbi to the
# transition prior and groups OOV runs into 2-char words (the
# dominant Chinese word length — the documented behavior of Jieba's
# own HMM on unseen text).
# ---------------------------------------------------------------------

#: default BMES log-probability tables (emission-uniform). Start: a
#: run begins with B or S; M/E are impossible openers. Transitions
#: encode the BMES automaton (B→M/E, M→M/E, E→B/S, S→B/S) with a
#: mild preference for 2-char words (B→E over B→M) and for pairing
#: over isolated singles (→B over →S).
DEFAULT_HMM_START = {"B": math.log(0.7), "S": math.log(0.3)}
DEFAULT_HMM_TRANS = {
    "B": {"M": math.log(0.3), "E": math.log(0.7)},
    "M": {"M": math.log(0.4), "E": math.log(0.6)},
    "E": {"B": math.log(0.7), "S": math.log(0.3)},
    "S": {"B": math.log(0.6), "S": math.log(0.4)},
}

_NEG = -1e18


def _viterbi_bmes(run: str, start=None, trans=None, emit=None) \
        -> list[str]:
    """Viterbi decode of a CJK run into words via BMES states
    (jieba/finalseg __cut). `emit` maps state -> {char: logp} and
    `start` maps state -> logp; missing entries get floors, so
    sparse user tables (e.g. start with only B/S, as the defaults
    now model) are fine. Backpointer arrays + one backward trace —
    O(n) like jieba's own implementation, never O(n²) path copies
    (code review r06: the default tiny dictionary makes whole
    documents one OOV run). The traceback always yields exactly
    len(run) tags, so the output is a partition of the input by
    construction, even under degenerate custom transition tables."""
    start = start or DEFAULT_HMM_START
    trans = trans or DEFAULT_HMM_TRANS
    emit = emit or {}
    floor = math.log(1e-8)

    def e(state: str, ch: str) -> float:
        return emit.get(state, {}).get(ch, floor)

    states = "BMES"
    v = {s: start.get(s, _NEG) + e(s, run[0]) for s in states}
    back: list[dict] = []  # back[i][s] = best predecessor of s at i+1
    for ch in run[1:]:
        nv, bp = {}, {}
        for s in states:
            best, prev = _NEG, None
            for p in states:
                t = trans.get(p, {}).get(s)
                if t is None:
                    continue
                c = v[p] + t
                if c > best:
                    best, prev = c, p
            nv[s] = (best + e(s, ch)) if prev is not None else _NEG
            bp[s] = prev
        v = nv
        back.append(bp)
    last = max(("E", "S"), key=lambda s: v[s])
    rev = [last]
    for bp in reversed(back):
        prev = bp.get(rev[-1])
        # None predecessor only under a degenerate custom table with
        # unreachable states — fall back to S (closes the word) so
        # the partition invariant survives rather than dropping chars
        rev.append(prev if prev is not None else "S")
    tags = rev[::-1]
    out: list[str] = []
    w: list[str] = []
    for ch, t in zip(run, tags):
        w.append(ch)
        if t in ("E", "S"):
            out.append("".join(w))
            w.clear()
    if w:
        out.append("".join(w))
    return out


def _hmm_regroup(tokens: list[str], words: frozenset[str],
                 start=None, trans=None, emit=None) -> list[str]:
    """Post-pass over a DAG segmentation: maximal runs of
    single-character OOV CJK tokens are re-decoded by the BMES
    Viterbi (known dictionary words and non-CJK tokens pass
    through) — exactly Jieba's cut(HMM=True) composition."""
    out: list[str] = []
    run: list[str] = []

    def flush() -> None:
        if not run:
            return
        if len(run) > 1:
            out.extend(_viterbi_bmes("".join(run), start, trans, emit))
        else:
            out.append(run[0])
        run.clear()

    for t in tokens:
        if len(t) == 1 and _is_cjk(t) and t not in words:
            run.append(t)
            continue
        flush()
        out.append(t)
    flush()
    return out


def make_dag_analyzer(dictionary=DEFAULT_CJK_DICT,
                      freqs: dict[str, int] | None = None,
                      hmm: bool = False,
                      hmm_params: dict | None = None):
    """Jieba-slot analyzer: DAG + unigram-cost DP segmentation (see
    _dag_segment), with optional per-word frequencies; ``hmm=True``
    adds the finalseg BMES-Viterbi pass over OOV runs (jieba's
    cut(HMM=True)); ``hmm_params`` = {'start','trans','emit'} plugs
    in trained tables. Registerable via register_analyzer like every
    other kernel."""
    fr = dict(freqs or {})
    hp = hmm_params or {}

    def kernel(text, words, maxlen):
        toks = _dag_segment(text, words, maxlen, fr)
        if hmm:
            toks = _hmm_regroup(toks, words, hp.get("start"),
                                hp.get("trans"), hp.get("emit"))
        return toks
    return make_fmm_analyzer(dictionary, kernel=kernel)


register_analyzer("word", tokenize)
register_analyzer("bigram", _bigram_analyzer)
register_analyzer("cjk", make_fmm_analyzer())
register_analyzer("cjk_rmm", make_rmm_analyzer())
register_analyzer("cjk_bimm", make_bimm_analyzer())
register_analyzer("cjk_dag", make_dag_analyzer())
register_analyzer("cjk_dag_hmm", make_dag_analyzer(hmm=True))

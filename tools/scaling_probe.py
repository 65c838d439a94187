#!/usr/bin/env python
"""One-decade local scaling probe of the three hot data-pipeline paths
(optimization r10): generate a deterministic synthetic corpus at 1x
(sf0.1-shaped: 5,000 docs / 2,000 vectors) and 10x, run each path at
both scales on the same session, and report wall times + the implied
scaling exponent log10(t_10x / t_1x).

The corpora are generated HERE (seed 7, NOT the driver's fixture) so
both scale points come from the same generator — nothing under
/root/testdata is touched, no result is persisted, and the driver's
bench contract is unchanged. Paths probed:

  minhash   minhash_lsh_pairs end-to-end (signature pass dominates)
  ivf_pq    ivf_pq_index_topk probe->ADC->rerank (index built untimed
            per scale — the index-once/query-many regime)
  stream    incremental_neardup_stream fold, 4 micro-batches at both
            scales (10x rows per batch — per-batch cost scaling)

Usage: python tools/scaling_probe.py [--mult 10] [--reps 2]
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = ("batch part spark line column order small sort fast value "
         "scan hash slow group agg filter query big key window row "
         "table stream merge data join shuffle plan broad cast").split()


def gen_docs(n: int):
    """n deterministic word-salad docs, ~300 chars, with planted
    near-dup pairs (every 20th doc = previous doc, one word edited)
    so the verify join has real work at every scale."""
    import numpy as np
    rng = np.random.RandomState(7)
    rows = []
    prev = None
    for i in range(n):
        if i % 20 == 19 and prev is not None:
            words = list(prev)
            words[rng.randint(len(words))] = VOCAB[rng.randint(len(VOCAB))]
        else:
            k = 40 + int(rng.randint(60))
            words = [VOCAB[j] for j in rng.randint(0, len(VOCAB), k)]
        prev = words
        rows.append((i, " ".join(words)))
    return rows


def gen_vecs(n: int, dim: int = 64):
    import numpy as np
    rng = np.random.RandomState(7)
    # 16 loose clusters so IVF cells are meaningful at both scales
    centers = rng.randn(16, dim)
    labels = rng.randint(0, 16, n)
    vecs = centers[labels] + 0.3 * rng.randn(n, dim)
    return [(i, [float(x) for x in vecs[i]]) for i in range(n)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    if args.mult < 2:
        ap.error("--mult must be >= 2 (the exponent needs a decade)")

    from incubator_hugegraph_spark.session import get_spark
    spark = get_spark("scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F  # noqa: F401
    from incubator_hugegraph_spark.data.dedup import minhash_lsh_pairs
    from incubator_hugegraph_spark.data.ann_index import (
        ivf_pq_index_topk, write_ivf_pq_index)
    from incubator_hugegraph_spark.streaming.incremental import (
        incremental_neardup_stream)

    work = tempfile.mkdtemp(prefix="scaling_probe_")
    results: dict[str, dict[int, float]] = {}

    def record(path: str, mult: int, secs: float) -> None:
        results.setdefault(path, {})[mult] = secs
        print(f"  {path} x{mult}: {secs:.2f}s", file=sys.stderr)

    for mult in (1, args.mult):
        n_docs, n_vecs = 5000 * mult, 2000 * mult
        docs = spark.createDataFrame(gen_docs(n_docs),
                                     "doc_id long, text string")
        ddir = f"{work}/docs_x{mult}"
        # 4 files -> 4 micro-batches for the stream probe; also the
        # many-split layout a real store gives the batch kernels
        docs.repartition(4).write.mode("overwrite").parquet(ddir)
        docs = spark.read.parquet(ddir)

        spark.sparkContext.setJobDescription(f"probe minhash x{mult}")
        best = math.inf
        for _ in range(args.reps):
            t0 = time.monotonic()
            minhash_lsh_pairs(docs, threshold=0.3).count()
            best = min(best, time.monotonic() - t0)
        record("minhash", mult, best)

        emb = spark.createDataFrame(gen_vecs(n_vecs),
                                    "vec_id long, embedding array<double>")
        pq = f"{work}/pq_x{mult}"
        write_ivf_pq_index(emb, pq, n_cells=16, m_sub=8, n_codes=16)
        qvecs = [(i, v) for i, v in gen_vecs(5)]
        spark.sparkContext.setJobDescription(f"probe ivf_pq x{mult}")
        best = math.inf
        for _ in range(args.reps):
            t0 = time.monotonic()
            ivf_pq_index_topk(spark, pq, qvecs, 10, n_probe=4,
                              rerank=96).count()
            best = min(best, time.monotonic() - t0)
        record("ivf_pq", mult, best)

        spark.sparkContext.setJobDescription(f"probe stream x{mult}")
        best = math.inf
        for _ in range(args.reps):
            ck = f"{work}/ck_{uuid.uuid4().hex[:8]}"
            t0 = time.monotonic()
            q, get_pairs = incremental_neardup_stream(
                spark, ddir, ck, max_files_per_trigger=1)
            q.awaitTermination()
            get_pairs().count()
            best = min(best, time.monotonic() - t0)
        record("stream", mult, best)
        spark.sparkContext.setJobDescription(None)

    print(f"{'path':<10}{'t_1x':>8}{'t_%dx' % args.mult:>9}{'ratio':>8}"
          f"{'exponent':>10}")
    for path, t in results.items():
        ratio = t[args.mult] / t[1]
        exp = math.log(ratio) / math.log(args.mult)
        print(f"{path:<10}{t[1]:>8.2f}{t[args.mult]:>9.2f}"
              f"{ratio:>8.2f}{exp:>10.2f}")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

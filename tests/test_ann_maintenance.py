"""ANN index maintenance hardening (optimization r11, advice r10):

1. Batch-id REUSE vs replay: compact_index records a per-batch
   content fingerprint; an append reusing a folded batch id with
   DIFFERENT content must raise (pre-r11 it was silently discarded),
   while a genuine engine replay (same content) still no-ops.
2. Crashed two-rename table swap: a crash between the renames leaves
   no live table; compact_index must heal it (roll forward) before
   doing anything else.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_spark.data.ann_index import (
    append_ivf_index, compact_index, ivf_index_topk, write_ivf_index)


def _emb(spark, ids):
    return spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), float(i % 2)])
         for i in ids],
        "vec_id long, embedding array<double>")


@pytest.fixture()
def ivf(spark, tmp_path):
    p = str(tmp_path / "ivf")
    write_ivf_index(_emb(spark, range(40)), p, n_cells=4)
    append_ivf_index(_emb(spark, range(40, 60)), p, batch_id=0)
    compact_index(spark, p)
    return p


def _topk(spark, p):
    return sorted(
        (r["query_id"], r["neighbor_id"])
        for r in ivf_index_topk(spark, p, query_vecs=[
            (0, [1.0, 2.0, 0.0])], k=5, n_probe=2).collect())


def test_replay_of_folded_batch_noops(spark, ivf):
    before = _topk(spark, ivf)
    append_ivf_index(_emb(spark, range(40, 60)), ivf, batch_id=0)
    assert _topk(spark, ivf) == before
    # and no batch=0 partition re-appeared
    assert not any("batch=0" in d for _, ds, _ in
                   os.walk(f"{ivf}/vectors") for d in ds)


def test_batch_id_reuse_raises(spark, ivf):
    with pytest.raises(ValueError, match="REUSE"):
        append_ivf_index(_emb(spark, range(100, 120)), ivf, batch_id=0)


def test_legacy_index_without_fingerprint_warns_and_skips(spark, ivf):
    shutil.rmtree(f"{ivf}/compacted_fp")
    before = _topk(spark, ivf)
    with pytest.warns(UserWarning, match="fingerprint"):
        append_ivf_index(_emb(spark, range(100, 120)), ivf, batch_id=0)
    assert _topk(spark, ivf) == before


def test_compact_heals_crashed_swap(spark, ivf):
    append_ivf_index(_emb(spark, range(60, 70)), ivf, batch_id=1)
    before = _topk(spark, ivf)
    # simulate a crash between the two renames: rewrite finished
    # (vectors.compact complete), live table renamed away
    v = f"{ivf}/vectors"
    shutil.copytree(v, v + ".compact")
    os.rename(v, v + ".old")
    assert not os.path.isdir(v)
    compact_index(spark, ivf)
    assert os.path.isdir(v)
    assert not os.path.isdir(v + ".old")
    assert not os.path.isdir(v + ".compact")
    # batch 1 folded by the healing run; results preserved
    assert not any(d.startswith("batch=") and d != "batch=-1"
                   for _, ds, _ in os.walk(v) for d in ds)
    assert _topk(spark, ivf) == before

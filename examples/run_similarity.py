"""The similarity-index family side by side, offline: exact
brute-force baseline, IVF (cluster pruning), PQ (memory compression),
and IVF-PQ (both) over the fixture embeddings, with recall@3 vs the
exact cosine baseline printed per index. Runs against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01).

Swap the fixture scan for your embedding table; at corpus scale the
index choice is a memory/recall trade the numbers below make
concrete — and every index here is deterministic, so results are
re-runnable bit-for-bit.
"""

import os

from pyspark.sql import functions as F

from cc2dataset_spark.operators import similarity as SIM
from cc2dataset_spark.session import build_spark_session
from cc2dataset_spark.sources.tables import load_table

if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = build_spark_session(master="local[8]", shuffle_partitions=32)

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)

    exact = SIM.brute_force_topk(queries, emb, k=3)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    cb = SIM.pq_codebook(emb)
    candidates = {
        "ivf": SIM.ivf_topk(queries, emb, k=3),
        "pq": SIM.pq_topk(queries, emb, cb, k=3),
        "ivfpq": SIM.ivfpq_topk(queries, emb, cb, k=3),
    }
    for name, df in candidates.items():
        got = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        total = sum(len(v) for v in truth.values())
        print(f"{name:6s} recall@3 vs exact cosine: {hits / total:.3f}")
    spark.stop()

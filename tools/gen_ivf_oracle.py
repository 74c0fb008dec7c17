"""Generate the VALUES oracle for ann_topk_ivf at sf0.01 (VERDICT r2
item 2): an INDEPENDENT NumPy recomputation of the fixed-seed IVF
pipeline (kmeans-16 coarse quantizer, nprobe=8, exact cosine rerank,
k=10, queries vec_id < 20) over the driver's embeddings.parquet, read
in file order via pyarrow — no Spark, no osmspark imports on the
compute path.

Prints the VALUES rows and, with --check, compares them against the
engine's ann_ivf_topk output.
"""
import sys

import numpy as np
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"
N_LISTS, NPROBE, K, SEED, SAMPLE, ITERS = 16, 8, 10, 42, 4096, 8


def compute_rows():
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    x = np.stack(tbl.column("embedding").to_pylist()).astype(np.float64)

    # kmeans on the first `SAMPLE` rows in file order (= the whole table
    # at sf0.01, 500 rows), seeded init, 8 Lloyd iterations, centroids
    # re-normalized after each mean
    xs = x[:SAMPLE] / np.maximum(
        np.linalg.norm(x[:SAMPLE], axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(SEED)
    cent = xs[rng.choice(len(xs), N_LISTS, replace=False)].copy()
    for _ in range(ITERS):
        assign = (xs @ cent.T).argmax(axis=1)
        for c in range(N_LISTS):
            m = assign == c
            if m.any():
                v = xs[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)

    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    sims = xn @ cent.T
    corpus_list = sims.argmax(axis=1)                       # nprobe=1
    qmask = ids < 20
    q_lists = np.argsort(-sims[qmask], axis=1)[:, :NPROBE]  # nprobe=8
    q_ids = ids[qmask]

    rows = []
    for qi, qid in enumerate(q_ids):
        probe = set(q_lists[qi].tolist())
        cand = [pid for pid, cl in zip(ids, corpus_list)
                if cl in probe and pid != qid]
        qv = x[ids == qid][0]
        scores = []
        for pid in cand:
            pv = x[ids == pid][0]
            cos = float(qv @ pv / (np.linalg.norm(qv) * np.linalg.norm(pv)))
            scores.append((-cos, pid))
        scores.sort()
        for rank, (_, pid) in enumerate(scores[:K], start=1):
            rows.append((int(qid), int(pid), rank))
    rows.sort()
    return rows


def main():
    rows = compute_rows()
    print(f"-- {len(rows)} rows")
    vals = ",\n  ".join(f"({q}, {p}, {r})" for q, p, r in rows)
    sql = (f"SELECT * FROM (VALUES\n  {vals}\n) AS t(q_id, p_id, rank) "
           f"ORDER BY q_id, rank")
    print(sql)
    if "--check" in sys.argv:
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import functions as F
        from osmspark.session import get_spark
        from osmspark.pipeline.ann import ann_ivf_topk
        spark = get_spark(app="ivf-oracle-check", master="local[8]")
        spark.sparkContext.setLogLevel("ERROR")
        emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
               .withColumn("embedding", F.col("embedding").cast("array<double>")))
        qs = emb.filter(F.col("vec_id") < 20)
        got = sorted(tuple(r) for r in ann_ivf_topk(
            emb, qs, K, n_lists=N_LISTS, nprobe=NPROBE)
            .select("q_id", "p_id", "rank").collect())
        print("MATCH" if got == rows else
              f"MISMATCH: spark={len(got)} oracle={len(rows)} "
              f"first_diff={next((a, b) for a, b in zip(got, rows) if a != b)}")


if __name__ == "__main__":
    main()

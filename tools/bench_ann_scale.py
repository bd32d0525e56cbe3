"""Million-embedding ANN evidence (VERDICT r4 item 3).

Mirrors BENCH/CORPUS_SCALE.md for the similarity family: a deterministic
synthetic 10^6 x 64-dim float corpus with planted neighbor structure, then
the three production operators at scale with ground truth measured, not
assumed:

  * ``cosine_topk``       — exact brute force over all 10^6 (the baseline)
  * ``lsh_bucket_topk``   — multi-table sign-LSH candidates + exact re-rank
  * ``ivf_topk``          — anchor-cell inverted file + exact re-rank
  * ``embedding_near_dup_pairs`` — cos >= 0.9 pairs via banded LSH

Reported per operator: wall-clock, recall vs the exact baseline (top-k
overlap for the search ops; found/true pairs for near-dup), max LSH band
bucket, and max task rows at the candidate-join surface.

Corpus construction (all Spark column expressions, xxhash64-seeded, no
driver loops, no external data):
  * ids 0..255: 32 query GROUPS of 8 members (group = id % 32, rank
    r = id // 32, noise scale 0.1 + 0.12 r) — members' cosine to the rank-0
    query spreads over ~[0.73, 0.99], so recall@k against exact top-k is a
    real measurement, not a fixed point.
  * ids 256..200255: 100,000 near-dup PAIRS, shared base per pair, noise
    scale 0.15 + ((pair * 7919) % 13) / 13 * 0.85 — pair cosine spreads
    over ~[0.58, 0.97], straddling the 0.9 near-dup threshold.
  * remaining ids: singletons (pure hash-random; background cosines are
    ~N(0, 1/8), max over 10^6 ~0.6 — they populate the exact top-k tail).
Every member vector = base(key) + s * noise(id), components uniform [-1, 1).

Usage: python tools/bench_ann_scale.py [n_vectors] [workdir]
Appends the results to BENCH/ANN_SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from harness import append_bench, max_task_rows, tool_spark, utc_stamp

DIM = 64
N_QUERY_GROUPS = 32
GROUP = 8
K = 10


def build_corpus(spark, n_vectors: int, n_pairs: int, path: str) -> float:
    from pyspark.sql import functions as F

    grouped_end = N_QUERY_GROUPS * GROUP
    pair_end = grouped_end + 2 * n_pairs
    assert n_vectors > pair_end, "corpus must be larger than the planted blocks"

    def u(*cols):
        # uniform [-1, 1) with ~2e-3 resolution, xxhash64-seeded
        return F.pmod(F.xxhash64(*cols), F.lit(2001)).cast("double") / 1000.0 - 1.0

    df = (
        spark.range(n_vectors)
        .withColumn(
            "base_key",
            F.when(F.col("id") < grouped_end, F.col("id") % N_QUERY_GROUPS)
            .when(F.col("id") < pair_end,
                  N_QUERY_GROUPS + (F.col("id") - grouped_end) / 2)
            .otherwise(F.lit(N_QUERY_GROUPS + n_pairs) + F.col("id"))
            .cast("long"),
        )
        .withColumn(
            "noise_scale",
            F.when(
                F.col("id") < grouped_end,
                0.1 + 0.12 * F.floor(F.col("id") / N_QUERY_GROUPS),
            )
            .when(
                F.col("id") < pair_end,
                0.15
                + (F.pmod(F.floor((F.col("id") - grouped_end) / 2) * 7919, F.lit(13)))
                / 13.0 * 0.85,
            )
            .otherwise(F.lit(0.0)),
        )
        .select(
            F.col("id").alias("vec_id"),
            "base_key",
            "noise_scale",
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda j: (
                    u(F.lit("b"), F.col("base_key"), j)
                    + F.col("noise_scale") * u(F.lit("n"), F.col("id"), j)
                ).cast("float"),
            ).alias("embedding"),
        )
    )
    t0 = time.time()
    df.repartition(64).write.mode("overwrite").parquet(path)
    return time.time() - t0


def recall_at_k(exact_rows, approx_rows, k: int) -> tuple[float, float]:
    """(recall@k, strong recall): overall = mean over queries of
    |exact top-k ∩ approx top-k| / k; strong restricts the truth set to
    exact neighbors with cos >= 0.7 (the planted structure) — the tail of
    exact top-k is near-random background (best of 10^6 random 64-dim
    cosines ~0.6) that no locality-sensitive bucket SHOULD retrieve."""
    from collections import defaultdict

    ex, st, ap = defaultdict(set), defaultdict(set), defaultdict(set)
    for r in exact_rows:
        ex[r["query_id"]].add(r["cand_id"])
        if r["cos_sim"] >= 0.7:
            st[r["query_id"]].add(r["cand_id"])
    for r in approx_rows:
        ap[r["query_id"]].add(r["cand_id"])
    overall = sum(len(ex[q] & ap[q]) for q in ex) / (len(ex) * k)
    n_strong = sum(len(s) for s in st.values())
    strong = sum(len(st[q] & ap[q]) for q in st) / max(n_strong, 1)
    return round(overall, 3), round(strong, 3)


def main() -> int:
    n_vectors = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ffs_ann_scale"

    from pyspark.sql import functions as F

    from flow_feature_spark.ops import similarity as sim

    spark = tool_spark(
        "ann_scale", cpus=32, shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "48g"},
    )
    os.makedirs(workdir, exist_ok=True)
    path = f"{workdir}/embeddings"
    # pairs block scales down for smoke runs; 100k at the 10^6 headline
    n_pairs = min(100_000, (n_vectors - N_QUERY_GROUPS * GROUP) // 4)
    gen_s = build_corpus(spark, n_vectors, n_pairs, path)
    emb = spark.read.parquet(path).select("vec_id", "embedding")
    print(f"corpus: {n_vectors:,} x {DIM} in {gen_s:.0f}s")

    out: dict = {"n_vectors": n_vectors, "dim": DIM, "n_pairs": n_pairs,
                 "gen_s": round(gen_s, 1)}

    # -- exact baseline: 32 queries x full corpus --------------------------
    t0 = time.time()
    exact = sim.cosine_topk(emb, n_queries=N_QUERY_GROUPS, k=K).collect()
    out["exact_s"] = round(time.time() - t0, 1)
    out["exact_cos_per_s"] = round(N_QUERY_GROUPS * n_vectors / out["exact_s"])

    # -- LSH top-k: two parameter points + a multiprobe point --------------
    for L, r, flips in ((8, 10, 0), (8, 12, 0), (8, 10, 4)):
        t0 = time.time()
        approx = sim.lsh_bucket_topk(
            emb, dim=DIM, n_queries=N_QUERY_GROUPS, k=K,
            n_tables=L, planes_per_table=r, multiprobe_flips=flips,
        ).collect()
        wall = round(time.time() - t0, 1)
        rec, rec_strong = recall_at_k(exact, approx, K)
        tag = f"lsh_L{L}_r{r}" + (f"_mp{flips}" if flips else "")
        out[tag] = {
            "wall_s": wall, "recall_at_k": rec, "recall_strong": rec_strong,
        }
        if not flips:
            keyed = sim.lsh_keyed_by_table(emb, DIM, L, r)
            out[tag]["max_bucket"] = int(
                keyed.groupBy("table_id", "key").count()
                .agg(F.max("count")).collect()[0][0]
            )
        print("lsh", L, r, flips, out[tag])

    # -- IVF top-k ---------------------------------------------------------
    for n_anchors, nprobe in ((64, 8),):
        t0 = time.time()
        approx = sim.ivf_topk(
            emb, dim=DIM, n_queries=N_QUERY_GROUPS, k=K,
            n_anchors=n_anchors, nprobe=nprobe,
        ).collect()
        wall = round(time.time() - t0, 1)
        rec, rec_strong = recall_at_k(exact, approx, K)
        out[f"ivf_a{n_anchors}_p{nprobe}"] = {
            "wall_s": wall, "recall_at_k": rec, "recall_strong": rec_strong,
        }
        print("ivf", n_anchors, nprobe, out[f"ivf_a{n_anchors}_p{nprobe}"])

    # -- near-dup pairs at threshold 0.9 -----------------------------------
    # exact truth: by construction true pairs share base_key; compute their
    # cosine exactly via a self-join on base_key (~100k pairs, cheap)
    keyed_src = spark.read.parquet(path)
    ga = keyed_src.select("base_key", F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    gb = keyed_src.select("base_key", F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    truth = (
        ga.join(gb, "base_key")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", sim.cosine(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= 0.9)
        .select("a", "b")
    )
    truth_pairs = {(r["a"], r["b"]) for r in truth.collect()}

    for L, r, flips in ((4, 16, 0), (4, 16, 2), (4, 16, 4)):
        t0 = time.time()
        nd = sim.embedding_near_dup_pairs(
            emb, dim=DIM, threshold=0.9, n_tables=L, planes_per_table=r,
            max_bucket_size=10_000, multiprobe_flips=flips,
        ).persist()
        n_found = nd.count()
        wall = round(time.time() - t0, 1)
        nd_mtr, nd_tasks = max_task_rows(nd)
        found = {(r_["vec_a"], r_["vec_b"]) for r_ in nd.collect()}
        nd.unpersist()
        hit = len(found & truth_pairs)
        tag = "near_dup" + (f"_mp{flips}" if flips else "")
        out[tag] = {
            "wall_s": wall,
            "found_pairs": n_found,
            "true_pairs": len(truth_pairs),
            "recall": round(hit / max(len(truth_pairs), 1), 3),
            "beyond_construction": len(found - truth_pairs),
            "max_task_rows": nd_mtr,
            "n_tasks": nd_tasks,
        }
        if not flips:
            # band-bucket skew surface at the near-dup params
            keyed = sim.lsh_keyed_by_table(emb, DIM, L, r)
            out[tag]["max_band_bucket"] = int(
                keyed.groupBy("table_id", "key").count()
                .agg(F.max("count")).collect()[0][0]
            )
        print(tag, out[tag])
    print("RESULT " + json.dumps(out))

    nd9 = out["near_dup"]
    nd2, nd4 = out["near_dup_mp2"], out["near_dup_mp4"]
    l10, l12 = out["lsh_L8_r10"], out["lsh_L8_r12"]
    lmp = out["lsh_L8_r10_mp4"]
    ivf = out["ivf_a64_p8"]
    md = f"""
## {n_vectors:,} x {DIM}-dim chain @ local[32] — {utc_stamp()}

Corpus: 32 query groups of 8 (cos ~[0.73, 0.99]) + {n_pairs:,} planted pairs
(cos ~[0.58, 0.97]) + {n_vectors - 256 - 2 * n_pairs:,} singletons; generated
in {out['gen_s']}s, all Spark expressions, deterministic.

| operator | params | wall | quality | skew surface |
|---|---|---|---|---|
| cosine_topk (exact) | 32 queries x {n_vectors:,} | {out['exact_s']}s ({out['exact_cos_per_s']:,} cos/s) | ground truth | broadcast queries, no shuffle |
| lsh_bucket_topk | L=8, r=10 | {l10['wall_s']}s | recall@{K} {l10['recall_at_k']} / strong {l10['recall_strong']} | max bucket {l10['max_bucket']:,} |
| lsh_bucket_topk | L=8, r=12 | {l12['wall_s']}s | recall@{K} {l12['recall_at_k']} / strong {l12['recall_strong']} | max bucket {l12['max_bucket']:,} |
| lsh_bucket_topk | L=8, r=10, multiprobe 4 flips | {lmp['wall_s']}s | recall@{K} {lmp['recall_at_k']} / strong {lmp['recall_strong']} | 5x probes, corpus side untouched |
| ivf_topk | K=64 anchors, nprobe=8 | {ivf['wall_s']}s | recall@{K} {ivf['recall_at_k']} / strong {ivf['recall_strong']} | cell equi-join |
| embedding_near_dup_pairs | t=0.9, L=4, r=16 | {nd9['wall_s']}s | recall {nd9['recall']} ({nd9['found_pairs']:,} found / {nd9['true_pairs']:,} true, +{nd9['beyond_construction']} beyond construction) | max band bucket {nd9['max_band_bucket']:,}; max task rows {nd9['max_task_rows']:,}/{nd9['n_tasks']} tasks |
| embedding_near_dup_pairs | t=0.9, L=4, r=16, multiprobe 2 flips | {nd2['wall_s']}s | recall {nd2['recall']} ({nd2['found_pairs']:,} found, +{nd2['beyond_construction']} beyond construction) | probe side 3x, home side untouched; max task rows {nd2['max_task_rows']:,}/{nd2['n_tasks']} tasks |
| embedding_near_dup_pairs | t=0.9, L=4, r=16, multiprobe 4 flips | {nd4['wall_s']}s | recall {nd4['recall']} ({nd4['found_pairs']:,} found, +{nd4['beyond_construction']} beyond construction) | probe side 5x; max task rows {nd4['max_task_rows']:,}/{nd4['n_tasks']} tasks |

Exact top-{K} includes ~3 background neighbors per query (max of 10^6 random
64-dim cosines ~0.6) — overall recall@k counts those; "strong" recall
restricts truth to planted neighbors (cos >= 0.7), the set a
locality-sensitive index is built to retrieve. Low-cos planted members
(rank-7 members at cos ~0.73: per-table collision p ~0.065 at r=10, union
~0.42 over L=8) bound the strong number — the measured sign-LSH S-curve,
not an implementation defect.
"""
    append_bench("ANN_SCALE.md", md, title="ANN at scale (million-embedding evidence)")

    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

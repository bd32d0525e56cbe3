"""Million-document dedup-chain evidence (VERDICT r3 item 2).

Builds a deterministic 10^6-doc synthetic corpus with a mid-band near-dup
mix (each variant doc mutates 0-12% of its base's words, spreading 3-gram
Jaccard over ~[0.45, 1.0] so the k=128/b=16 LSH threshold s* = 0.707 is
actually exercised), then times the FULL production dedup chain at prod
params:

    signatures (xxhash64 fast path, k=128)
      -> banded LSH candidate pairs (b=16)
      -> connected components (min-label + pointer jumping)
      -> anti-join (drop non-canonical docs)

reporting wall-clock per stage, max-task-rows at every shuffle surface
(band-bucket sizes, pair-table partitions, CC label partitions), and
cluster-count sanity against the construction (each variant with mutation
rate <= ~5% must pair with its base; 6/13 of variants sit in that band).

Corpus generation is all Spark column expressions over spark.range — no
driver-side loops, fully deterministic (xxhash64-seeded), no external data.

Usage: python tools/bench_corpus_scale.py [n_docs] [workdir]
Appends the results table to BENCH/CORPUS_SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from harness import append_bench, max_task_rows, tool_spark, utc_stamp

VOCAB = 30_000
VARIANT_FRAC = 0.3  # 30% of docs are near-dup variants of a base doc


def build_corpus(spark, n_docs: int, path: str) -> dict:
    """Deterministic synthetic corpus written to parquet. Doc i < n_base is a
    base doc (40-80 words from a 30k vocab, xxhash64-seeded); doc i >= n_base
    is a variant of base (i - n_base) with mutation percentage
    (i * 7919) % 13 — uniform over 0..12%."""
    from pyspark.sql import functions as F

    n_var = int(n_docs * VARIANT_FRAC)
    n_base = n_docs - n_var

    def ph(seed: int, *cols):
        return F.pmod(F.xxhash64(F.lit(seed), *cols), F.lit(2**31))

    df = spark.range(n_docs).withColumn(
        "base_id",
        F.when(F.col("id") < n_base, F.col("id")).otherwise(F.col("id") - n_base),
    ).withColumn(
        "mut_pct",
        F.when(F.col("id") < n_base, F.lit(0)).otherwise(
            (F.col("id") * 7919) % 13
        ).cast("int"),
    ).withColumn(
        "n_words", (F.lit(40) + ph(7, F.col("base_id")) % 41).cast("int")
    )

    def word(j):
        # j is the transform's element column (word position)
        base_word = F.concat(
            F.lit("w"), (ph(42, F.col("base_id"), j) % VOCAB).cast("string")
        )
        mut_word = F.concat(
            F.lit("m"), (ph(5, F.col("id"), j) % 1_000_000_000).cast("string")
        )
        return F.when(
            ph(9, F.col("id"), j) % 100 < F.col("mut_pct"), mut_word
        ).otherwise(base_word)

    docs = df.select(
        F.col("id").alias("doc_id"),
        "base_id",
        "mut_pct",
        F.array_join(
            F.transform(F.sequence(F.lit(0), F.col("n_words") - 1), word), " "
        ).alias("text"),
    )
    t0 = time.time()
    docs.repartition(64).write.mode("overwrite").parquet(path)
    gen_s = time.time() - t0
    return {"n_docs": n_docs, "n_base": n_base, "n_var": n_var, "gen_s": gen_s}


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ffs_corpus_scale"

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from flow_feature_spark.ops import dedup as dd
    from flow_feature_spark.ops.cluster import dedup_clusters

    spark = tool_spark(
        "corpus_scale",
        cpus=32,
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "48g"},
    )
    os.makedirs(workdir, exist_ok=True)
    corpus_path = f"{workdir}/docs"

    meta = build_corpus(spark, n_docs, corpus_path)
    docs = spark.read.parquet(corpus_path).select("doc_id", "text")
    print(f"corpus: {meta}")

    # -- stage 1a: signatures at prod params (persisted once; the pair join,
    # the bucket probe and nothing else re-read the 1M x 128 table) ----------
    t0 = time.time()
    sig = dd.minhash_signatures_fast(docs, k=dd.N_MINHASH).persist(
        StorageLevel.DISK_ONLY
    )
    n_sigs = sig.count()
    sig_s = time.time() - t0

    # -- stage 1b: banded LSH candidate pairs --------------------------------
    t0 = time.time()
    pairs = dd.minhash_lsh_candidates(
        docs, k=dd.N_MINHASH, bands=dd.N_BANDS, signatures=sig
    ).persist(StorageLevel.DISK_ONLY)
    n_pairs = pairs.count()
    pairs_s = time.time() - t0
    pair_mtr, pair_tasks = max_task_rows(pairs)

    # band-bucket skew surface: the largest (band_id, band_hash) bucket bounds
    # the per-key join fan-out
    t0 = time.time()
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.md5(
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"mh{b * (dd.N_MINHASH // dd.N_BANDS) + r}").cast(
                                    "string"
                                )
                                for r in range(dd.N_MINHASH // dd.N_BANDS)
                            ],
                        )
                    ).alias("bh"),
                )
                for b in range(dd.N_BANDS)
            ])
        ).alias("band"),
    )
    bucket_max = (
        banded.groupBy("band.band_id", "band.bh")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    bucket_s = time.time() - t0

    # -- stage 2: connected components --------------------------------------
    t0 = time.time()
    clusters = dedup_clusters(pairs).persist(StorageLevel.DISK_ONLY)
    n_nodes = clusters.count()
    n_clusters = clusters.select("component").distinct().count()
    n_drop = clusters.filter(~F.col("is_canonical")).count()
    cc_s = time.time() - t0

    # -- stage 3: anti-join (keep canonical + unpaired docs) -----------------
    t0 = time.time()
    losers = clusters.filter(~F.col("is_canonical")).select("doc_id")
    kept = docs.join(losers, "doc_id", "left_anti").count()
    anti_s = time.time() - t0

    # -- sanity vs construction ---------------------------------------------
    # variants with mutation <= 5% have expected 3-gram Jaccard >= ~0.74 —
    # above s* = 0.707 — so >= 6/13 of variants must be found; <=12/13 upper
    strong_lo = int(meta["n_var"] * 6 / 13 * 0.9)
    strong_hi = int(meta["n_var"] * 12 / 13 * 1.1)
    ok_pairs = strong_lo <= n_pairs <= strong_hi
    ok_kept = kept == n_docs - n_drop

    out = {
        "n_docs": n_docs,
        "gen_s": round(meta["gen_s"], 1),
        "sig_s": round(sig_s, 1),
        "n_sigs": n_sigs,
        "pairs_s": round(pairs_s, 1),
        "cc_s": round(cc_s, 1),
        "anti_s": round(anti_s, 1),
        "total_chain_s": round(sig_s + pairs_s + cc_s + anti_s, 1),
        "n_pairs": n_pairs,
        "n_clustered_docs": n_nodes,
        "n_clusters": n_clusters,
        "n_dropped": n_drop,
        "n_kept": kept,
        "docs_per_sec_chain": round(n_docs / (sig_s + pairs_s + cc_s + anti_s)),
        "max_band_bucket": int(bucket_max),
        "bucket_probe_s": round(bucket_s, 1),
        "pairs_max_task_rows": pair_mtr,
        "pairs_n_tasks": pair_tasks,
        "sanity_pairs_in_band": ok_pairs,
        "sanity_kept_consistent": ok_kept,
        "pair_band": [strong_lo, strong_hi],
    }
    print("RESULT " + json.dumps(out))

    stamp = utc_stamp()
    lines = [
        f"\n## {n_docs:,}-doc chain @ local[32] — {stamp}\n",
        f"Corpus: {meta['n_base']:,} base + {meta['n_var']:,} variant docs "
        f"(40-80 words, mutation 0-12% -> mid-band Jaccard), generated in "
        f"{meta['gen_s']:.0f}s, all-Spark-expressions, deterministic.\n",
        "| stage | wall-clock | notes |",
        "|---|---|---|",
        f"| signatures (k=128, xxhash64 fast path, shuffle-free) | "
        f"{out['sig_s']}s | {n_sigs:,} signatures |",
        f"| banded LSH pairs (b=16) | "
        f"{out['pairs_s']}s | {n_pairs:,} candidate pairs; max band bucket "
        f"{out['max_band_bucket']:,} docs; pair table max task rows "
        f"{pair_mtr:,} across {pair_tasks} tasks |",
        f"| connected components | {out['cc_s']}s | {n_nodes:,} clustered docs "
        f"-> {n_clusters:,} clusters, {n_drop:,} non-canonical |",
        f"| anti-join | {out['anti_s']}s | kept {kept:,} of {n_docs:,} |",
        f"| **total chain** | **{out['total_chain_s']}s** | "
        f"**{out['docs_per_sec_chain']:,} docs/s** end-to-end |",
        "",
        f"Sanity: candidate pairs within the constructed strong-pair band "
        f"[{strong_lo:,}, {strong_hi:,}]: {ok_pairs}; kept == docs - dropped: "
        f"{ok_kept}.",
        "",
    ]
    append_bench(
        "CORPUS_SCALE.md",
        "\n".join(lines),
        title="Corpus-scale dedup chain (million-doc evidence)",
    )

    pairs.unpersist()
    clusters.unpersist()
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""MinHash LSH candidate quality: precision/recall vs exact Jaccard.

VERDICT r2 item 6: the k=8/b=4 (r=2) parameters of rounds 1-2 give an LSH
threshold s* = (1/b)^(1/r) ~ 0.5 with huge variance — too noisy for 10^9-doc
dedup. The production defaults are now k=128/b=16 (r=8, s* ~ 0.707, steep
S-curve). This tool MEASURES both parameter sets against exact Jaccard ground
truth on the sf documents table and appends the table to
BENCH/MINHASH_QUALITY.md.

Ground truth: ngram_jaccard_pairs at a low threshold (every co-shingled pair
with its exact Jaccard). Candidates: minhash_lsh_candidates at each (k, b).
precision@t = |cand with J >= t| / |cand|; recall@t = |cand with J >= t| /
|pairs with J >= t|.

Usage: python tools/minhash_quality.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from harness import append_bench, tool_spark, utc_stamp


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from flow_feature_spark.ops import dedup as dd

    spark = tool_spark("minhash_quality", cpus=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_note = "near-dup-heavy testdata corpus"
    if os.environ.get("MINHASH_SYNTH_MIDBAND"):
        # the testdata corpus's similarity distribution is bimodal (J ~ 1 or
        # J ~ 0), which cannot exercise the LSH threshold curve — build a
        # mid-band corpus: each base doc gets one variant with a seeded
        # fraction of words replaced, spreading exact Jaccard over (0.1, 1)
        import hashlib

        rows = docs.select("doc_id", "text").limit(400).collect()
        out_rows = []
        for r in rows:
            words = (r["text"] or "").split()
            if len(words) < 30:
                continue
            out_rows.append((int(r["doc_id"]), " ".join(words)))
            frac = (int(r["doc_id"]) % 7) / 10.0  # 0.0 .. 0.6
            def _h(i: int) -> str:
                return hashlib.md5(f"{r['doc_id']}:{i}".encode()).hexdigest()

            # md5-derived choice, NOT hash() (PYTHONHASHSEED-salted)
            mut = [
                (_h(i)[:8] if int(_h(i)[8:12], 16) % 1000 < frac * 1000 else w)
                for i, w in enumerate(words)
            ]
            out_rows.append((int(r["doc_id"]) + 10_000_000, " ".join(mut)))
        docs = spark.createDataFrame(out_rows, "doc_id long, text string")
        corpus_note = (f"synthetic mid-band corpus ({len(out_rows)} docs: "
                       "each base + a variant with 0-60% of words replaced)")
    n_docs = docs.count()

    truth = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.01).collect()
    }

    # (family, k, b): the cross-engine md5 family and the codegen'd xxhash64
    # fast family (ops/dedup.minhash_signatures_fast) at the production
    # parameters — measuring both pins the "quality curves carry over" claim
    param_sets = [("md5", 8, 4), ("md5", 32, 8), ("md5", 128, 16),
                  ("fast", 128, 16)]
    thresholds = [0.5, 0.7, 0.9]
    rows = []
    for fam, k, b in param_sets:
        r_ = k // b
        s_star = (1.0 / b) ** (1.0 / r_)
        kw = {}
        if fam == "fast":
            kw["signatures"] = dd.minhash_signatures_fast(docs, k=k)
        cand = {
            (r["doc_a"], r["doc_b"])
            for r in dd.minhash_lsh_candidates(docs, k=k, bands=b, **kw).collect()
        }
        for t in thresholds:
            truth_t = {p for p, j in truth.items() if j >= t}
            hits = {p for p in cand if truth.get(p, 0.0) >= t}
            prec = len(hits) / max(len(cand), 1)
            rec = len(hits) / max(len(truth_t), 1)
            rows.append(
                f"| {fam} k={k} b={b} r={r_} (s*={s_star:.3f}) | {t} | {len(cand):,} "
                f"| {len(truth_t):,} | {prec:.3f} | {rec:.3f} |"
            )
    spark.stop()

    stamp = utc_stamp()
    md = [
        f"# MinHash LSH candidate quality ({stamp})",
        "",
        f"Input: {sf_dir} documents ({n_docs:,} docs; {corpus_note}). "
        "Ground truth = exact word-3-gram Jaccard "
        "over every co-shingled pair. precision@t counts candidates whose "
        "exact Jaccard >= t; recall@t counts them against all true pairs "
        ">= t.",
        "",
        "| params | t | candidates | true pairs | precision@t | recall@t |",
        "|---|---|---|---|---|---|",
        *rows,
    ]
    append_bench("MINHASH_QUALITY.md", "\n".join(md))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

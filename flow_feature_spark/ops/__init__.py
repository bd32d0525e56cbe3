"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine), similarity search (brute-force + LSH-bucketed
ANN), text analysis (language-ID, quality, token counting, fingerprinting),
and multimodal binary-column plumbing.
"""

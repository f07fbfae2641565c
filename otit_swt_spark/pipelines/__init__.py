"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (SURVEY §2), these are the operators a
100 TB text/embedding pipeline needs: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), similarity search (brute-force + LSH-bucketed
cosine), text analysis (language-ID, quality scores, token counts,
fingerprints) and multimodal binary-column plumbing.

All built from JVM-side pyspark.sql.functions (no Python row UDFs in hot
paths); shuffles happen only on the intended keys (band buckets / group
keys), so the operators scale horizontally.
"""

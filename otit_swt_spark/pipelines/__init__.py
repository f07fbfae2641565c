"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (SURVEY §2), these are the operators a
100 TB text/embedding pipeline needs: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, corpus-wide paragraph dedup), similarity search
(brute-force + LSH-bucketed + IVF cosine, int8 quantization + quantized
top-k), sequence packing, text analysis (language-ID, quality scores,
token counts, fingerprints, repetition stats), train/test decontamination,
PII scrubbing, deterministic + stratified + weighted sampling, event
analytics (funnels, retention, histograms, session paths, Welch A/B
readouts), graph analytics (co-occurrence edges, degrees, triangles,
PageRank), skew-relief salted joins, keyed merge/upsert + incremental
aggregate maintenance, multimodal binary-column plumbing, annotation QA
(Cohen's kappa, Krippendorff's alpha, reliability-diagram calibration
bins), and bitext / parallel-corpus candidate mining.

All built from JVM-side pyspark.sql.functions (no Python row UDFs in hot
paths); shuffles happen only on the intended keys (band buckets / group
keys), so the operators scale horizontally.
"""

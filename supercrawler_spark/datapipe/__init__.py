"""Training-data pipeline operators for a 100 TB crawl corpus.

Beyond the reference's crawl operators, these are the first-class
data-processing stages a large-scale training pipeline runs over the crawled
corpus: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality scoring, token counting,
fingerprinting), multimodal binary-column plumbing, and cross-modal
image+caption curation (exact cross-modal dedup, encoder alignment
filtering, metadata quality gating).

Everything is declarative DataFrame ops where possible (JVM-side, Catalyst-
optimizable); Arrow-batched pandas UDFs only where array math (SimHash,
random-hyperplane LSH, image decode) genuinely needs numpy.
"""

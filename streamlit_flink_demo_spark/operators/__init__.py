"""Engine extensions: LLM-data-pipeline operators.

Dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search (brute-force + LSH ANN), text analysis (lang-id,
quality, token counting, fingerprinting), multimodal column plumbing.
All built as DataFrame compositions — no row-at-a-time Python in any
hot path; Pandas UDFs only where semantics require them (multimodal
decode).
"""

"""Extension operator library (Tier C, SURVEY.md §2.C) — the
training-data-pipeline operators a 100 TB corpus needs: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting), and
multimodal binary-column plumbing.

All operators are DataFrame->DataFrame: composable, lazy, and planned by
Catalyst. Python executes only inside Arrow-batched pandas UDFs where a
built-in expression genuinely cannot express the semantics.
"""

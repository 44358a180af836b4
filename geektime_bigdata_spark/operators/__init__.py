"""Operator library: each public function is ``(spark, sf_dir) -> DataFrame``.

Modules map to SURVEY.md §2 operator groups plus the training-data-pipeline
extensions:

- :mod:`relational` — scans, filters, projections, aggregates, set ops
  (reference homework-1/-2/-3/-5 parity).
- :mod:`text` — tokenize / explode / inverted index (homework-4 parity).
- :mod:`joins` — join strategies + TPC-H-style flagship analytics.
- :mod:`windows` — window functions, sessionization, as-of joins.
- :mod:`dedup` — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup.
- :mod:`similarity` — embedding cosine top-k (brute force + LSH-bucketed).
- :mod:`textstats` — language ID, quality scoring, token counting,
  fingerprinting.
- :mod:`multimodal` — binary-column decode/feature plumbing (stubbed codecs).
"""

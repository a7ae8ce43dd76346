"""Engine operators beyond plain SQL surface: training-data pipeline
ops (dedup, similarity, text analysis, multimodal plumbing).

All hot paths are built-in JVM expressions (higher-order array
functions, xxhash64) or Arrow-batched pandas UDFs — never row-at-a-
time Python (SURVEY.md §2.10).
"""

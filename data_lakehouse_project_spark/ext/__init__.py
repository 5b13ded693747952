"""LLM-data-pipeline extensions (SURVEY §2.8 / BASELINE.json north star).

Not present in the reference (its operator surface stops at medallion
aggregates — SURVEY §2.9); these are the operators a 100 TB training-data
pipeline needs: deduplication, similarity search, text analysis,
multimodal column handling. All built from JVM-side DataFrame expressions;
Python appears only in Arrow-batched Pandas UDFs for multimodal decode.
"""

"""Structured Streaming surface (SURVEY §2.10 — engine additions):
file-drop link ingest with watermarked dedup, windowed event
aggregations sharing the batch plans, and foreachBatch enrichment."""

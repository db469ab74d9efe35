"""Structured Streaming ingestion (incremental crawl -> graph tables)."""

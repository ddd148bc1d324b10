"""Structured Streaming ingestion of newly arriving page files."""

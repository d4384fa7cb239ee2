"""Ingestion sources: REST fan-out plumbing + fixture registry."""

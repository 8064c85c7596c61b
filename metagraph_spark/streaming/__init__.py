"""Structured Streaming surface (incremental ingest + maintenance).

The reference has NO streaming (Dask is lazy batch, SURVEY.md §2.5); the
north rule is batch-iterative. This module is therefore additive: it keeps
the transcript-derived edge tables INCREMENTALLY up to date as new
transcript turns arrive, so the batch-iterative algorithms always run
against fresh edges.
"""

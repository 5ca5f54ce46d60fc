"""Structured Streaming tier (SURVEY.md §2.6, OP-D5).

The reference has no streaming semantics — its chunked cursor loop
(reference ``filefilter.py:202-263``) is bounded micro-batching over a
static input. This package is the extension tier: event-time windows
with watermarks over the ``events`` table, runnable to completion on
static data with the ``availableNow`` trigger so batch oracles apply.
"""

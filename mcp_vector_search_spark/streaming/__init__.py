"""Structured Streaming incremental-index path (reference §2.10
ST1-ST5: watcher debounce, resumable reindex, atomic swap)."""

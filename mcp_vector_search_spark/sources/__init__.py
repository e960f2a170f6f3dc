"""Sources: discovery, chunking, and ingest-side transforms
(reference §2.1 S1-S7)."""

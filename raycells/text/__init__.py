"""Text analysis + deduplication operators for the documents table."""

"""Pipeline operators: exact dedup, LSH candidate join, connected
components, keep-best-copy selection, incremental anti-joins, similarity
search, multimodal plumbing."""

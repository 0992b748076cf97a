"""Streaming / incremental surface — the daemon-mode analog."""

"""Plans: end-to-end staged pipelines with checkpoint/resume."""

"""End-to-end pipelines: extraction, lineage, checkpoint/resume."""

"""End-to-end pipelines over the stage library."""

"""Pure, deterministic per-record functions — the engine's semantic core.

Every function here is side-effect free and process-independent so Ray task
retries and multi-CPU runs are bit-reproducible.
"""

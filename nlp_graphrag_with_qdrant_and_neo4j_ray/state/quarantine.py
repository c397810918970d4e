"""Per-row failure quarantine: log-and-skip with an on-disk record.

The reference skips a whole FILE on error and continues
(/root/reference/graphrag/cli/main.py:150-154) and zero-vectors on embed
failure (utils/common.py:92-98); r1 engine stages instead propagated the
exception, so one poisoned row killed its block with no record (VERDICT
finding "missing #4"). This wrapper restores skip-and-continue at ROW
granularity without taxing the happy path: the batch runs vectorized as
usual; only on failure does it bisect (O(log n) extra calls per poisoned
row) until the poisoned rows are isolated, each recorded to
``<out>/quarantine/`` as ``(stage, row_id, error)``.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import QUARANTINE


class QuarantineRecorder:
    """Picklable recorder shipped into stage functions/actors (same
    worker-local-file pattern as ``LineageRecorder``)."""

    def __init__(self, out_dir: str, stage: str):
        self.dir = os.path.join(out_dir, "quarantine")
        self.stage = stage

    def record(self, row_id: str, error: str) -> None:
        os.makedirs(self.dir, exist_ok=True)
        row = {"stage": self.stage, "row_id": row_id, "error": error[:2000]}
        fname = f"{self.stage}-{uuid.uuid4().hex}.parquet"
        pq.write_table(
            pa.Table.from_pylist([row], schema=QUARANTINE),
            os.path.join(self.dir, fname),
        )


def quarantined(batch_fn, id_col: str, out_schema: pa.Schema,
                recorder: QuarantineRecorder | None = None):
    """Wrap a per-batch transform with bisecting row quarantine.

    Happy path: one call, zero overhead. On exception the batch splits in
    half recursively; sub-batches that succeed keep their vectorized
    output, single rows that fail are skipped and recorded. If every row
    of a batch is poisoned the stage emits ``out_schema``'s empty table
    so the pipeline completes.
    """

    def run(batch: pa.Table) -> list[pa.Table]:
        try:
            return [batch_fn(batch)]
        except Exception as e:  # noqa: BLE001 — quarantine any row failure
            n = batch.num_rows
            if n <= 1:
                if n == 1 and recorder is not None:
                    try:
                        row_id = str(batch.column(id_col)[0].as_py())
                    except Exception:  # id itself unreadable
                        row_id = "<unreadable>"
                    recorder.record(row_id, repr(e))
                return []
            mid = n // 2
            return run(batch.slice(0, mid)) + run(batch.slice(mid))

    def safe(batch: pa.Table) -> pa.Table:
        parts = run(batch)
        if not parts:
            return out_schema.empty_table()
        if len(parts) == 1:
            return parts[0]
        return pa.concat_tables(parts)

    return safe

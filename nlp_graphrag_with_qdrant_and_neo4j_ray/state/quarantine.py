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

Guard rails (ADVICE r2): a per-row skip policy must not let a SYSTEMIC
failure (bad config, missing dependency, schema bug) masquerade as a few
bad rows — that would pay ~2n bisect calls, flood the quarantine dir,
then publish an empty-but-_SUCCESS checkpoint that resume skips forever.
So (a) if more than ``max_failure_rate`` of a batch's rows quarantine
(with an absolute floor so one bad row in a tiny batch still skips), the
original exception propagates and the stage FAILS; (b) a batch's
quarantine records are buffered and written as ONE parquet file, not one
file per row.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import QUARANTINE

# a batch may quarantine up to this fraction of its rows (but always at
# least _MIN_FAILURES rows) before the failure is treated as systemic
MAX_FAILURE_RATE = 0.05
_MIN_FAILURES = 8


class QuarantineRecorder:
    """Picklable recorder shipped into stage functions/actors (same
    worker-local-file pattern as ``LineageRecorder``)."""

    def __init__(self, out_dir: str, stage: str):
        self.dir = os.path.join(out_dir, "quarantine")
        self.stage = stage

    def record(self, row_id: str, error: str) -> None:
        self.record_many([(row_id, error)])

    def record_many(self, rows: list[tuple[str, str]]) -> None:
        """One parquet file per BATCH of failures (ADVICE r2 — one file
        per row turned a failed 262k-row batch into 262k tiny files)."""
        if not rows:
            return
        os.makedirs(self.dir, exist_ok=True)
        tbl = pa.Table.from_pylist(
            [{"stage": self.stage, "row_id": rid, "error": err[:2000]}
             for rid, err in rows],
            schema=QUARANTINE,
        )
        fname = f"{self.stage}-{uuid.uuid4().hex}.parquet"
        pq.write_table(tbl, os.path.join(self.dir, fname))


def quarantined(batch_fn, id_col: str, out_schema: pa.Schema,
                recorder: QuarantineRecorder | None = None,
                max_failure_rate: float = MAX_FAILURE_RATE):
    """Wrap a per-batch transform with bisecting row quarantine.

    Happy path: one call, zero overhead. On exception the batch splits in
    half recursively; sub-batches that succeed keep their vectorized
    output, single rows that fail are skipped and buffered (one
    quarantine file per batch). If the batch's failure count exceeds
    ``max_failure_rate`` (and the absolute floor), the FIRST row error
    re-raises — a systemic stage failure must fail the stage, not
    publish an empty checkpoint.
    """

    def run(batch: pa.Table, failures: list) -> list[pa.Table]:
        try:
            return [batch_fn(batch)]
        except Exception as e:  # noqa: BLE001 — quarantine any row failure
            n = batch.num_rows
            if n <= 1:
                if n == 1:
                    try:
                        row_id = str(batch.column(id_col)[0].as_py())
                    except Exception:  # id itself unreadable
                        row_id = "<unreadable>"
                    failures.append((row_id, repr(e), e))
                return []
            mid = n // 2
            return run(batch.slice(0, mid), failures) \
                + run(batch.slice(mid), failures)

    def safe(batch: pa.Table) -> pa.Table:
        failures: list = []
        parts = run(batch, failures)
        if failures:
            allowed = max(_MIN_FAILURES,
                          int(max_failure_rate * batch.num_rows))
            if len(failures) > allowed:
                raise RuntimeError(
                    f"systemic stage failure: {len(failures)}/"
                    f"{batch.num_rows} rows failed (quarantine allows "
                    f"{allowed}); first error on row "
                    f"{failures[0][0]!r}: {failures[0][1]}"
                ) from failures[0][2]
            if recorder is not None:
                recorder.record_many([(rid, err) for rid, err, _ in failures])
        if not parts:
            return out_schema.empty_table()
        if len(parts) == 1:
            return parts[0]
        return pa.concat_tables(parts)

    return safe

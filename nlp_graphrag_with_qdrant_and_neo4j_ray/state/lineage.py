"""Per-partition lineage records (north_rule requirement).

The reference has no lineage — its closest analogue is per-call log lines
and returned counter dicts (/root/reference/graphrag/cli/main.py:108-113).
Here every stage batch appends a row
``(partition_id, stage, stage_version, input_fragment, row_count_in,
row_count_out, triple_count, wall_ms)`` to ``<out>/lineage/``.

Single-node note: workers write small Parquet files directly into the
lineage directory (local disk). On a multi-node deployment the same writes
target shared storage; at very large scale the per-batch rows would be
buffered per task and flushed once per block — the record schema is the
contract, the write granularity an implementation knob.
"""

from __future__ import annotations

import hashlib
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import LINEAGE


def partition_id_for(stage: str, fragment: str) -> str:
    return hashlib.blake2b(f"{stage}:{fragment}".encode(), digest_size=8).hexdigest()


class LineageRecorder:
    """Picklable recorder shipped into stage functions/actors."""

    def __init__(self, out_dir: str, stage: str, stage_version: str):
        self.dir = os.path.join(out_dir, "lineage")
        self.stage = stage
        self.stage_version = stage_version

    def record(
        self,
        input_fragment: str,
        rows_in: int,
        rows_out: int,
        triple_count: int,
        wall_ms: float,
    ) -> None:
        os.makedirs(self.dir, exist_ok=True)
        row = {
            "partition_id": partition_id_for(self.stage, input_fragment),
            "stage": self.stage,
            "stage_version": self.stage_version,
            "input_fragment": input_fragment,
            "row_count_in": rows_in,
            "row_count_out": rows_out,
            "triple_count": triple_count,
            "wall_ms": wall_ms,
        }
        # unique worker-local filename; content, not name, is the record
        fname = f"{self.stage}-{uuid.uuid4().hex}.parquet"
        pq.write_table(
            pa.Table.from_pylist([row], schema=LINEAGE), os.path.join(self.dir, fname)
        )


def first_fragment(batch: pa.Table, key_col: str) -> str:
    """Stable fragment label for a batch: its first key value."""
    if batch.num_rows == 0:
        return "<empty>"
    return str(batch.column(key_col)[0].as_py())

"""Exactly-once foreachBatch sinks via a committed-batch ledger.

Structured Streaming's contract is at-least-once per micro-batch: after a
crash between sink work and checkpoint commit, the SAME batch_id is
redelivered with the SAME data. Sinks that are not naturally idempotent
(the incremental rollup's read-merge-overwrite, an external POST, a
non-keyed append) would double-apply. The standard discipline — what the
Delta/Iceberg `txnAppId`/`txnVersion` option does natively — is a durable
ledger of committed batch ids consulted before applying:

    apply(batch) THEN commit marker          (marker written atomically last)

A replayed batch finds its marker and is skipped. A crash BEFORE the marker
re-runs the body — so the body itself must be atomic-or-idempotent at the
storage level (the repo's writers already are: overwrite-by-partition,
write-then-rename); the ledger's job is to stop the double-APPLY of
logically non-idempotent merges, not to replace storage atomicity.

The marker write is tmp + atomic rename on the local/HDFS-style filesystems
this repo targets; on S3 the rename becomes a PUT (atomic per object) — the
pattern holds. One marker per batch: O(batches) tiny files, compactable by
retention (markers older than the checkpoint's retained offsets can never
be replayed and may be pruned)."""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame


def idempotent_foreach_batch(
    body: Callable[[DataFrame, int], None],
    ledger_dir: str,
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch body so each batch_id applies at most once per
    ledger. Compose outward of other wrappers (e.g. the quality gate): the
    ledger should record the WHOLE batch effect, quarantine included."""
    os.makedirs(ledger_dir, exist_ok=True)

    def wrapper(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger_dir, f"batch_{batch_id}.done")
        if os.path.exists(marker):
            return  # redelivery of a fully-committed batch: skip the apply
        body(batch_df, batch_id)
        tmp = f"{marker}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, marker)  # atomic: the commit point

    return wrapper

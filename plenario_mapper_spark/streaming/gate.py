"""Batch-level quality circuit breaker for streaming ingest.

The mapper pipeline validates PER ROW (bad rows split to dead-letter — the
reference's behavior). Some failures are BATCH-shaped, not row-shaped: an
upstream schema break, a duplicate replay, a partial extract — every row
individually plausible, the batch collectively wrong. The standard defense is
a constraint battery evaluated per micro-batch (the deequ/"write-audit-
publish" pattern): run `operators/quality.check_constraints` (one aggregation
pass, H15) on each batch; a clean batch proceeds to the real sink, a failing
batch diverts WHOLE to a quarantine directory with its failure report, and
processing continues — the stream never stalls on bad data, and nothing
partially lands.

Composes with foreachBatch checkpointing: the gate decision is deterministic
in the batch contents, so a replayed batch makes the same decision.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame

from plenario_mapper_spark.operators.quality import Check, check_constraints


def gated_foreach_batch(
    checks: list[Check],
    on_pass: Callable[[DataFrame, int], None],
    quarantine_dir: str,
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch body with the constraint gate. Failing batches are
    written to `<quarantine_dir>/batch_<id>/` (data as parquet + report as
    JSON) and `on_pass` is NOT called for them. The batch is localCheckpoint-
    ed first so the gate's aggregation and the downstream write don't
    recompute the source scan twice."""

    def body(batch: DataFrame, batch_id: int) -> None:
        batch = batch.localCheckpoint()
        report = check_constraints(batch, checks).collect()
        failed = [r for r in report if not r["passed"]]
        if failed:
            dest = os.path.join(quarantine_dir, f"batch_{batch_id}")
            batch.write.mode("overwrite").parquet(os.path.join(dest, "data"))
            with open(os.path.join(dest, "report.json"), "w") as f:
                json.dump(
                    [
                        {
                            "check_name": r["check_name"],
                            "violations": r["violations"],
                            "passed": r["passed"],
                        }
                        for r in report
                    ],
                    f,
                )
            return
        on_pass(batch, batch_id)

    return body

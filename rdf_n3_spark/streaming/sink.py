"""The shared exactly-once micro-batch sink scaffold.

Every continuous job in this package (text/embedding ingest gates,
KMV/count-min sketch rollups) writes per-epoch parquet with the same
discipline, maintained HERE once because it is the correctness-critical
part: ``foreachBatch`` → epoch-partitioned output → DYNAMIC partition
overwrite, so a crash between the parquet write and the streaming
checkpoint commit replays the epoch onto ITS OWN partition (same batch
⇒ same rows ⇒ identical partition contents) instead of appending a
second copy; other epochs' partitions are untouched.  ``availableNow``
processes everything pending then stops — the batch-job-shaped trigger
the tests and cron-style deployments use.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def epoch_overwrite_sink(stream: DataFrame, out_dir: str,
                         checkpoint_dir: str,
                         transform: Callable[[DataFrame, int], DataFrame]):
    """``transform(batch_df, epoch_id) -> DataFrame`` computes each
    micro-batch's output rows; they land in ``out_dir`` partitioned by
    ``epoch`` under the replay-idempotent overwrite contract above.
    Returns the unstarted ``DataStreamWriter``."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        (
            transform(batch_df, epoch_id)
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(out_dir)
        )

    return (
        stream.writeStream.foreachBatch(write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )

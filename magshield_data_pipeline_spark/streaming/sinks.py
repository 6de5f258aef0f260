"""Streaming sinks: the K2 upsert sink driven per micro-batch.

The reference's refresh model is "HTTP trigger → full re-extract →
overwrite the named workbook" (SURVEY §2.10). Structured Streaming
subsumes it: run the same aggregation over ``readStream``, and
``foreachBatch`` applies the SAME batch upsert sink
(`sinks.overwrite_by_name`, replace-else-create) on every trigger — each
micro-batch refreshes the named object in place, turning the periodic
full re-export into an incremental standing query. ``foreachBatch``
hands over a plain batch DataFrame, so any batch sink (parquet here,
an idempotent REST PUT in production) plugs in unchanged.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame

from magshield_data_pipeline_spark import sinks


def stream_refresh_by_name(
    stream_df: DataFrame,
    out_dir: str,
    name: str,
    fmt: str = "parquet",
    output_mode: str = "complete",
) -> str | None:
    """Run *stream_df* with Trigger.AvailableNow, refreshing the named
    target via the batch upsert sink on each micro-batch. Returns the
    final written path (None if the stream produced no rows).

    ``complete`` mode suits aggregated streams (each trigger rewrites
    the whole result — the reference's overwrite semantics); pass
    ``append`` for non-aggregated pipelines.
    """
    last_path: list[str | None] = [None]

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            last_path[0] = sinks.overwrite_by_name(batch_df, out_dir, name, fmt)

    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_sink_{name}_")
    q = (
        stream_df.writeStream.foreachBatch(_write)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return last_path[0]

"""Structured Streaming surface (SURVEY §2.9 I5).

The reference is batch-incremental — its watermark/delta protocol is a
hand-rolled streaming program — so the engine exposes the native streaming
equivalents: windowed aggregation over an event stream, stateful streaming
dedup, and custom per-key state via applyInPandasWithState.  Each operator
is a (stream builder, drain) pair so the correctness gate can run it to
completion on a bounded file stream and hash-compare the drained result
against a batch oracle: streaming and batch must agree on complete data.
"""

from mrsboraetl_spark.streaming.stateful import (
    drain_to_batch,
    stream_events,
)

__all__ = ["stream_events", "drain_to_batch", "streaming_pipeline_sync"]


def streaming_pipeline_sync(*args, **kwargs):
    """Lazy re-export (streaming/pipeline.py imports the engine, which
    a lightweight streaming import shouldn't pay for)."""
    from mrsboraetl_spark.streaming.pipeline import (
        streaming_pipeline_sync as _f,
    )

    return _f(*args, **kwargs)

from .events_stream import (
    events_stream,
    stream_click_purchase_full_outer_join,
    stream_click_purchase_join,
    stream_click_purchase_left_join,
    stream_enrich_customers,
    run_stream_to_memory,
    stream_dedup_events,
    stream_session_windows,
    stream_tumbling_counts,
)
from .cdc import (
    changes_readstream,
    changes_to_parquet,
    replay_changes,
    version_changes,
)
from .wordcount_stream import (
    documents_stream,
    stream_wordcount,
)
from .foreach_batch import (
    fanout_writer,
    idempotent_parquet_writer,
    run_foreach_batch,
    versioned_merge_sink,
    versioned_upsert_sink,
)

__all__ = [
    "changes_readstream",
    "changes_to_parquet",
    "events_stream",
    "replay_changes",
    "version_changes",
    "fanout_writer",
    "idempotent_parquet_writer",
    "run_foreach_batch",
    "run_stream_to_memory",
    "stream_click_purchase_full_outer_join",
    "stream_click_purchase_join",
    "stream_click_purchase_left_join",
    "stream_enrich_customers",
    "documents_stream",
    "stream_dedup_events",
    "stream_session_windows",
    "stream_tumbling_counts",
    "stream_wordcount",
    "versioned_merge_sink",
    "versioned_upsert_sink",
]

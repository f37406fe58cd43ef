from .stream_ops import (  # noqa: F401
    compact_signature_store,
    use_rocksdb_state,
    stream_dedup,
    stream_event_counts,
    stream_near_dup_minhash,
    stream_near_dup_srp,
    stream_sessionize,
    stream_windowed_agg,
)

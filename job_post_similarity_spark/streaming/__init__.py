from .stream_ops import (  # noqa: F401
    compact_signature_store,
    use_rocksdb_state,
    stream_click_attribution,
    stream_dedup,
    stream_event_counts,
    stream_keep_latest,
    stream_near_dup_minhash,
    stream_near_dup_srp,
    stream_sessionize,
    stream_static_enrich,
    stream_topk,
    stream_windowed_agg,
)

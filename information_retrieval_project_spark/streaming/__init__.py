from .incremental import incremental_tf_ingest, windowed_event_counts  # noqa: F401

from gaia_spark.streaming.ingest import (
    read_pages_stream,
    stream_cell_counts,
    stream_dedup_urls,
    stream_kde_grid,
    stream_session_windows,
    stream_spatial_join,
    stream_stream_join,
    stream_to_icelite,
    write_stream_batch,
)

__all__ = [
    "read_pages_stream",
    "stream_cell_counts",
    "stream_dedup_urls",
    "stream_kde_grid",
    "stream_session_windows",
    "stream_spatial_join",
    "stream_stream_join",
    "stream_to_icelite",
    "write_stream_batch",
]

from gaia_spark.streaming.ingest import (
    read_pages_stream,
    stream_cell_counts,
    stream_dedup_urls,
    stream_to_icelite,
)

__all__ = [
    "read_pages_stream",
    "stream_cell_counts",
    "stream_dedup_urls",
    "stream_to_icelite",
]

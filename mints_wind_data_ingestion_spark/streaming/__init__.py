from .pipeline import run_ingest_stream, stream_windowed_counts

__all__ = ["run_ingest_stream", "stream_windowed_counts"]

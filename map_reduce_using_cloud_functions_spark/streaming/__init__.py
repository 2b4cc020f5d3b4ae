from .file_index import start_file_index_stream
from .windows import streaming_tumbling_counts, streaming_session_values

__all__ = [
    "start_file_index_stream",
    "streaming_tumbling_counts",
    "streaming_session_values",
]

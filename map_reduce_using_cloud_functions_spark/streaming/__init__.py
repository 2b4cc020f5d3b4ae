from .file_index import start_file_index_stream
from .joins import click_attribution, interval_join
from .near_dedup import (
    admit_and_index_batch,
    admit_batch,
    start_front_door_stream,
    start_near_dedup_stream,
)
from .windows import streaming_tumbling_counts, streaming_session_values

__all__ = [
    "start_file_index_stream",
    "interval_join",
    "click_attribution",
    "streaming_tumbling_counts",
    "streaming_session_values",
    "admit_batch",
    "admit_and_index_batch",
    "start_front_door_stream",
    "start_near_dedup_stream",
]

from .ingest import (
    bronze_to_silver,
    kafka_source,
    latest_wins_dedup,
    micro_batch_writer,
    parse_state_vectors,
    windowed_counts,
)

__all__ = [
    "bronze_to_silver",
    "kafka_source",
    "latest_wins_dedup",
    "micro_batch_writer",
    "parse_state_vectors",
    "windowed_counts",
]

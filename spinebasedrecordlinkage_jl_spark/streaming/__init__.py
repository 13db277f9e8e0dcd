"""Structured Streaming: transcript ingestion, stateful dedup, and
micro-batch linkage against the frozen spine."""

from .dedup import stream_exact_dedup
from .linkage import stream_link_to_spine
from .records import stream_conversation_records, stream_transcripts

__all__ = [
    "stream_conversation_records",
    "stream_exact_dedup",
    "stream_link_to_spine",
    "stream_transcripts",
]

"""Structured Streaming: transcript ingestion, stateful dedup,
streaming near-duplicate detection, micro-batch linkage against the
(refreshable) spine, and streaming entity formation."""

from .dedup import stream_exact_dedup
from .linkage import stream_link_and_form, stream_link_to_spine
from .neardup import stream_neardup_pairs
from .records import stream_conversation_records, stream_transcripts

__all__ = [
    "stream_conversation_records",
    "stream_exact_dedup",
    "stream_link_and_form",
    "stream_link_to_spine",
    "stream_neardup_pairs",
    "stream_transcripts",
]

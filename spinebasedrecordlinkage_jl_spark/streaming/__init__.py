"""Structured Streaming ingestion of transcript turns."""

from .records import stream_conversation_records, stream_transcripts

__all__ = ["stream_conversation_records", "stream_transcripts"]

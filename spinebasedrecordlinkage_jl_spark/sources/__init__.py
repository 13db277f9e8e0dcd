"""Input sources: table readers + deterministic synthetic transcripts."""

from .bucketed import plan_has_exchange, read_bucketed, write_bucketed
from .readers import read_table, read_testdata, read_transcripts
from .transcripts import (
    EVENTS_TO_TRANSCRIPTS_SQL,
    TRANSCRIPT_SCHEMA,
    synthesize_transcripts,
    transcripts_from_events,
)

__all__ = [
    "EVENTS_TO_TRANSCRIPTS_SQL",
    "TRANSCRIPT_SCHEMA",
    "plan_has_exchange",
    "read_bucketed",
    "read_table",
    "read_testdata",
    "read_transcripts",
    "synthesize_transcripts",
    "transcripts_from_events",
    "write_bucketed",
]

from .incremental import (  # noqa: F401
    read_transcript_stream,
    annotate_stream,
    windowed_mention_rates,
    session_windows,
)

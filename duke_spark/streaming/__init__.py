from duke_spark.streaming.transcripts_stream import (  # noqa: F401
    run_stream_to_triples, stream_transcripts, stream_triples,
    turn_rate_windows, write_triples_stream)
from duke_spark.streaming.stateful import (  # noqa: F401
    running_conversation_topics)

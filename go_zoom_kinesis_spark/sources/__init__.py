"""Sources & sinks.

The reference's only source is the Kinesis GetRecords API
(src/client.rs:167-233) and its only sink is the checkpoint store
(src/store/mod.rs:13-20). Here the batch surface reads/writes every
Spark file format (formats.py) and the streaming surface builds file /
rate test streams plus the documented aws-kinesis production source
(streams.py).
"""

from .formats import read_any, write_any
from .streams import file_stream, kinesis_stream, rate_stream

__all__ = ["read_any", "write_any", "file_stream", "kinesis_stream", "rate_stream"]

from .result_stream import ResultStream  # noqa: F401
from .incremental import incremental_sketch_sink, read_sketch_state  # noqa: F401
from .stateful import sessionize_stream  # noqa: F401

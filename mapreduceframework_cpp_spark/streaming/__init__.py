from mapreduceframework_cpp_spark.streaming.stream import (  # noqa: F401
    events_stream,
    run_to_memory,
)

from mapreduceframework_cpp_spark.plans.progress import (  # noqa: F401
    JobState,
    JobStateTracker,
    Stage,
)

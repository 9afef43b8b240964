from mapreduceframework_cpp_spark.operators.asof import asof_join  # noqa: F401

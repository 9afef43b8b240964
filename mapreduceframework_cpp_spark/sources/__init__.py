from mapreduceframework_cpp_spark.sources.tables import TABLES, load, tbl  # noqa: F401

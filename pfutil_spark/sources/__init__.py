from pfutil_spark.sources.synthetic import sourcecode_table  # noqa: F401

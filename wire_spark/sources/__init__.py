from wire_spark.sources.factory import DataSource, data_source_factory  # noqa: F401

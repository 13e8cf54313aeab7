from wire_spark.sinks.factory import DataSink, data_sink_factory  # noqa: F401

from wire_spark.streaming.windows import (  # noqa: F401
    session_agg,
    sliding_agg,
    tumbling_agg,
)

from wire_spark.transforms.core import Map, Transform, chain  # noqa: F401
from wire_spark.transforms.json_tools import (  # noqa: F401
    parse_event_time,
    uppercase_json_string,
    uppercase_strings,
)

"""Sources & sinks (SURVEY.md §2.1 S1-S8)."""

from geektime_bigdata_spark.sources.textio import (
    TRAFFIC_SCHEMA,
    read_traffic_log,
    write_tsv,
)
from geektime_bigdata_spark.sources.files import dist_copy, list_tree

__all__ = [
    "TRAFFIC_SCHEMA",
    "read_traffic_log",
    "write_tsv",
    "dist_copy",
    "list_tree",
]

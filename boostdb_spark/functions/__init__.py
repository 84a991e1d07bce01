from boostdb_spark.functions.scalar import (
    json_prop,
    ns_to_micros,
    ns_to_timestamp,
    pandas_scale_clip,
    pandas_udaf_range,
    ts_lit,
    ts_ns,
    ts_parts,
)

__all__ = [
    "json_prop",
    "ns_to_micros",
    "ns_to_timestamp",
    "pandas_scale_clip",
    "pandas_udaf_range",
    "ts_lit",
    "ts_ns",
    "ts_parts",
]

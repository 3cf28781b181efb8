"""collectd write_http protocol (SURVEY §3 rows S6, C2).

Reference semantics [P: protocol/collectd/collectd.go — JSONWriteFormat,
NewDatapoint]: the body is a JSON array; each element carries parallel
arrays ``dsnames``/``dstypes``/``values`` plus identity fields
(``host``, ``plugin``, ``plugin_instance``, ``type``,
``type_instance``) and a float-seconds ``time``. Each element expands
to one datapoint per values[i]:

- metric name = ``type[.type_instance][.dsname]`` where the dsname
  component is appended only when it isn't the default ``"value"``,
- dstype → metric type: gauge→gauge, counter/derive→cumulative_counter,
  absolute→count,
- dimensions = host, plugin, plugin_instance, type_instance, dsname
  (empty identity fields omitted).

Spark shape: ``from_json`` (explicit schema) → ``explode`` elements →
``posexplode(arrays_zip(...))`` — all Catalyst builtins, no UDF; the
expansion is a narrow transform (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

COLLECTD_ELEMENT_SCHEMA = T.StructType(
    [
        T.StructField("dsnames", T.ArrayType(T.StringType()), True),
        T.StructField("dstypes", T.ArrayType(T.StringType()), True),
        T.StructField("values", T.ArrayType(T.DoubleType()), True),
        T.StructField("time", T.DoubleType(), True),
        T.StructField("interval", T.DoubleType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("plugin", T.StringType(), True),
        T.StructField("plugin_instance", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("type_instance", T.StringType(), True),
    ]
)

COLLECTD_BODY_SCHEMA = T.ArrayType(COLLECTD_ELEMENT_SCHEMA)

# dstype → canonical metric type [P: collectd.go — dstype mapping]
_DSTYPE_TO_METRIC_TYPE = {
    "gauge": "gauge",
    "counter": "cumulative_counter",
    "derive": "cumulative_counter",
    "absolute": "count",
}


def dstype_to_metric_type(col):
    expr = F.lit("gauge")
    for dstype, mt in _DSTYPE_TO_METRIC_TYPE.items():
        expr = F.when(F.lower(col) == dstype, F.lit(mt)).otherwise(expr)
    return expr


def parse_collectd_json(df: DataFrame, body_col: str = "body") -> DataFrame:
    """S6+C2: JSON body → one row per (element, values[i])."""
    parsed = df.withColumn("_elems", F.from_json(F.col(body_col), COLLECTD_BODY_SCHEMA))
    elem = F.col("_elem")
    exploded = parsed.select(
        "*", F.explode("_elems").alias("_elem")
    ).select(
        "*",
        F.posexplode(
            F.arrays_zip(
                elem["dsnames"].alias("dsnames"),
                elem["dstypes"].alias("dstypes"),
                elem["values"].alias("values"),
            )
        ).alias("_i", "_z"),
    )

    z = F.col("_z")
    dsname = z["dsnames"]
    metric = F.concat_ws(
        ".",
        elem["type"],
        F.when(elem["type_instance"] != "", elem["type_instance"]),
        F.when(dsname != "value", dsname),
    )
    dims = F.map_filter(
        F.create_map(
            F.lit("host"), elem["host"],
            F.lit("plugin"), elem["plugin"],
            F.lit("plugin_instance"), elem["plugin_instance"],
            F.lit("type_instance"), elem["type_instance"],
            F.lit("dsname"), dsname,
        ),
        lambda _, v: v.isNotNull() & (v != ""),
    )
    return (
        exploded.withColumns(
            {
                "metric": metric,
                "value": z["values"],
                "value_str": F.lit(None).cast("string"),
                "metric_type": dstype_to_metric_type(z["dstypes"]),
                "epoch_us": F.round(elem["time"] * F.lit(1_000_000.0)).cast("bigint"),
                "ts": F.timestamp_micros(
                    F.round(elem["time"] * F.lit(1_000_000.0)).cast("bigint")
                ),
                "dimensions": dims,
            }
        )
        .drop("_elems", "_elem", "_z", "_i")
    )

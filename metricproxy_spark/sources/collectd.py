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
        # Notification-only fields [P: protocol/collectd/collectd.go —
        # JSONWriteBody severity/message]: a write_http element with a
        # severity+message (and no values arrays) is a notification, not
        # a datapoint batch.
        T.StructField("severity", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
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


def sfxdim_params(query_col) -> "F.Column":
    """``?sfxdim_KEY=val&...`` query string → MAP<dim, val>.

    The reference's collectd listener folds any request query parameter
    prefixed ``sfxdim_`` into the dimensions of EVERY datapoint/event in
    that request [P: protocol/collectd/collectd.go — sfxDimQueryParamPrefix].
    Pure Catalyst: str_to_map on '&'/'=' then key-prefix filter+strip —
    no UDF, narrow transform.
    """
    params = F.str_to_map(F.coalesce(query_col, F.lit("")), F.lit("&"), F.lit("="))
    dims = F.map_filter(params, lambda k, v: k.startswith("sfxdim_") & v.isNotNull())
    return F.transform_keys(dims, lambda k, _: F.substring(k, 8, 2**31 - 1))


def _merge_query_dims(dims, query_col):
    if query_col is None:
        return dims
    # request-level dims lose to per-element identity dims on key clash,
    # matching the reference (element fields are written last).
    return F.map_concat(
        F.map_filter(
            sfxdim_params(query_col), lambda k, _: ~F.map_contains_key(dims, k)
        ),
        dims,
    )


def parse_collectd_notifications(
    df: DataFrame, body_col: str = "body", query_col: str | None = None
) -> DataFrame:
    """S6 notifications: write_http elements with severity+message →
    §2.2 event rows.

    Reference semantics [P: protocol/collectd/collectd.go — NewEvent]:
    event type = ``type[.type_instance]`` (same naming as the metric
    path minus the dsname component), category COLLECTD, identity
    fields as dimensions, severity+message carried as properties.
    Output matches EVENT_SCHEMA plus an ``epoch_us`` convenience column.
    """
    parsed = df.withColumn("_elems", F.from_json(F.col(body_col), COLLECTD_BODY_SCHEMA))
    elem = F.col("_elem")
    exploded = parsed.select("*", F.explode("_elems").alias("_elem")).where(
        elem["severity"].isNotNull() & elem["values"].isNull()
    )
    dims = F.map_filter(
        F.create_map(
            F.lit("host"), elem["host"],
            F.lit("plugin"), elem["plugin"],
            F.lit("plugin_instance"), elem["plugin_instance"],
            F.lit("type_instance"), elem["type_instance"],
        ),
        lambda _, v: v.isNotNull() & (v != ""),
    )
    dims = _merge_query_dims(dims, F.col(query_col) if query_col else None)
    epoch_us = F.round(elem["time"] * F.lit(1_000_000.0)).cast("bigint")
    return exploded.withColumns(
        {
            "event_type": F.concat_ws(
                ".",
                elem["type"],
                F.when(elem["type_instance"] != "", elem["type_instance"]),
            ),
            "category": F.lit("COLLECTD"),
            "dimensions": dims,
            "properties": F.to_json(
                F.struct(
                    elem["message"].alias("message"),
                    F.upper(elem["severity"]).alias("severity"),
                )
            ),
            "ts": F.timestamp_micros(epoch_us),
            "epoch_us": epoch_us,
        }
    ).drop("_elems", "_elem")


def parse_collectd_json(
    df: DataFrame, body_col: str = "body", query_col: str | None = None
) -> DataFrame:
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
    dims = _merge_query_dims(dims, F.col(query_col) if query_col else None)
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

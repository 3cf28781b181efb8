"""Wire-protocol sources: parse/normalize transforms (SURVEY §3.1/§3.3).

Each module turns a DataFrame holding raw wire payload columns (text
lines, JSON bodies, protobuf bytes) into the canonical datapoint shape
of :mod:`metricproxy_spark.schemas`. All hot paths are pure Catalyst
expressions — parse failures never fail the batch; they produce nulls
that are filtered and countable (``observe``), mirroring the
reference's count-and-drop invalid-line handling.
"""

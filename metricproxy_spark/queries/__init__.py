"""Named queries — one module per SURVEY §3 operator family.

Modules self-register via :func:`metricproxy_spark.registry.register`;
:func:`metricproxy_spark.registry.load_all` imports them all.
"""

"""Config-driven pipeline plans (SURVEY §2.1 "Config-defined pipeline
graph"): the reference wires its whole runtime from one JSON document
[P: config/config.go — ProxyConfig, Load; main.go — setupForwarders,
setupListeners]. :mod:`metricproxy_spark.plans.config` provides the
same declaration surface over Structured Streaming.
"""

from metricproxy_spark.plans.config import build_pipeline, load_config

__all__ = ["build_pipeline", "load_config"]

from metricproxy_spark.cli import main

raise SystemExit(main())

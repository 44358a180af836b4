"""`python -m geektime_bigdata_spark` dispatches to the CLI."""

from geektime_bigdata_spark.cli import main

raise SystemExit(main())

from automated_dow30_earnings_reports_spark.plans import flagship, relational  # noqa: F401

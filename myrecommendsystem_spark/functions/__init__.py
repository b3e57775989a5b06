from myrecommendsystem_spark.functions.compat import round_stable, sql_round_stable  # noqa: F401

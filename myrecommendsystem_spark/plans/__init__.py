from myrecommendsystem_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_queries,
    all_oracle_sql,
    REGISTRY,
)

from myrecommendsystem_spark.io.readers import (  # noqa: F401
    events_as_ratings,
    load_table,
    read_products_delimited,
    read_rating_lines,
    read_ratings_csv,
    register_views,
)
from myrecommendsystem_spark.io.writers import write_overwrite  # noqa: F401

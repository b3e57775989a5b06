from myrecommendsystem_spark.ml.als import (  # noqa: F401
    item_similarities,
    product_recs,
    train_als,
    user_recs,
    user_recs_flat,
)
from myrecommendsystem_spark.ml.tuner import grid_search_als  # noqa: F401

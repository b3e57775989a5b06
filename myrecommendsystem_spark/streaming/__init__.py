from myrecommendsystem_spark.streaming.log_filter import (  # noqa: F401
    PRODUCT_RATING_PREFIX,
    filter_rating_log,
)
from myrecommendsystem_spark.streaming.recommender import (  # noqa: F401
    compact_recent_ratings,
    run_streaming_recommender,
    stream_recs_flat,
    stream_recs_for_events,
    upsert_by_key,
)
from myrecommendsystem_spark.streaming.state import (  # noqa: F401
    recent_ratings_state,
)
from myrecommendsystem_spark.streaming.windows import (  # noqa: F401
    dedup_within_watermark,
    sliding_event_counts,
    tumbling_event_counts,
)

from algorithmproject_spark_spark.streaming.facade import (  # noqa: F401
    stream_read_kafka,
    stream_read_parquet,
    stream_read_rate,
    stream_read_socket,
    stream_write_console,
    stream_write_kafka,
    stream_write_memory,
    stream_write_parquet,
)
from algorithmproject_spark_spark.streaming.windows import (  # noqa: F401
    sessionized_counts,
    windowed_value_agg,
)
from algorithmproject_spark_spark.streaming.stateful import (  # noqa: F401
    user_profile_stateful,
)
from algorithmproject_spark_spark.streaming.dedup import (  # noqa: F401
    dedup_stream,
)
from algorithmproject_spark_spark.streaming.markov import (  # noqa: F401
    transition_counts_batch,
    transition_counts_stateful,
)

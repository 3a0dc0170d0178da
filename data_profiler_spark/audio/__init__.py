from data_profiler_spark.audio.decode import (  # noqa: F401
    decode_pcm16,
    decode_stats,
    salt_repartition,
)

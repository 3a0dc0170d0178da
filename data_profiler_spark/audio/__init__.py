from data_profiler_spark.audio.decode import (  # noqa: F401
    decode_pcm16,
    decode_stats,
    salt_repartition,
)
from data_profiler_spark.audio.transform import (  # noqa: F401
    loudness_normalize,
    resample,
    transform_clips,
    trim_silence,
)

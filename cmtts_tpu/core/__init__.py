from cmtts_tpu.core.config import Config, load_configs
from cmtts_tpu.core.masks import (
    length_mask,
    pick_bucket,
    DEFAULT_TEXT_BUCKETS,
    DEFAULT_MEL_BUCKETS,
)

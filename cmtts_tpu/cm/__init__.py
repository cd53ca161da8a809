from cmtts_tpu.cm.karras import (
    KarrasSchedule,
    get_sigmas_karras,
    get_weightings,
)
from cmtts_tpu.cm.losses import consistency_loss, variance_loss
from cmtts_tpu.cm.sampling import sample_mel

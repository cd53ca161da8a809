from cmtts_tpu.models.encoder import FFTEncoder, sinusoid_table
from cmtts_tpu.models.variance import VarianceAdaptor, dur_to_mel2ph
from cmtts_tpu.models.denoiser import Denoiser
from cmtts_tpu.models.cmtts import CMTTS

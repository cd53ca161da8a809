from cmtts_tpu.train.resample import create_schedule_sampler
from cmtts_tpu.train.ema import create_ema_and_scales_fn
from cmtts_tpu.train.state import CMTrainState, create_train_state
from cmtts_tpu.train.loop import make_train_step, make_synthesize_step

from cmtts_tpu.audio.stft import MelSpectrogram, mel_filterbank
from cmtts_tpu.audio import wavio

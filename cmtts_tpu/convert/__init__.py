"""Checkpoint conversion from the reference PyTorch CM-TTS."""

from cmtts_tpu.convert.from_torch import (  # noqa: F401
    convert_cm_state_dict,
    load_torch_cm_checkpoint,
)

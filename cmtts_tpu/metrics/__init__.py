"""Offline evaluation metric suite (reference ``all_metrics.py`` +
``metrics/``), self-contained: the reference's C-extension deps
(pyworld/pysptk/librosa/fastdtw/torchmetrics/resemblyzer) are absent in
this environment, so every feature extractor and aligner is implemented
natively on numpy/scipy — substitutions are documented per metric.
"""

from cmtts_tpu.metrics.harness import Cal, CalOneModel  # noqa: F401

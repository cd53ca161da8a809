"""Figure helpers (reference ``utils/tools.py:610-687`` plot_mel family)."""

from __future__ import annotations

import numpy as np


def plot_mel(mel: np.ndarray, path: str, title: str = "Synthesized mel") -> None:
    """Save a mel-spectrogram image (mel: (T, n_mels))."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 3))
    im = ax.imshow(np.asarray(mel).T, origin="lower", aspect="auto",
                   interpolation="none")
    ax.set_title(title)
    ax.set_xlabel("frames")
    ax.set_ylabel("mel bins")
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)

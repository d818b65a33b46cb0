"""TensorBoard observability — scalars, validation images, histograms.

Mirrors the reference's logging surface (SURVEY §5.5):
- scalars: training_{gate,mel,mel_post,tacotron}_loss, training_loss,
  val_loss, val_mel_loss, learning rate (model/tts_model.py:227-251,
  run/train.py:241)
- first-val-batch images: GT mel, predicted mel, alignment, gate
  target-vs-sigmoid(pred) scatter (model/tts_model.py:255-287,319-385)
- parameter histograms every 1000 steps (model/tts_model.py:289-292)
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _plot_to_numpy(fig) -> np.ndarray:
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    return data


def plot_spectrogram(spectrogram: np.ndarray) -> np.ndarray:
    """(mels, frames) -> HWC uint8 image (model/tts_model.py:332-344)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 3))
    im = ax.imshow(spectrogram, aspect="auto", origin="lower")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Frames")
    ax.set_ylabel("Channels")
    fig.tight_layout()
    data = _plot_to_numpy(fig)
    plt.close(fig)
    return data


def plot_alignment(alignment: np.ndarray) -> np.ndarray:
    """(chars, frames) -> HWC image (model/tts_model.py:347-363)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(alignment, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Decoder timestep")
    ax.set_ylabel("Encoder timestep")
    fig.tight_layout()
    data = _plot_to_numpy(fig)
    plt.close(fig)
    return data


def plot_gate(gate_targets: np.ndarray, gate_outputs: np.ndarray) -> np.ndarray:
    """Scatter of target vs predicted gate (model/tts_model.py:366-385)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 3))
    ax.scatter(range(len(gate_targets)), gate_targets, alpha=0.5, color="green", marker="+", s=1, label="target")
    ax.scatter(range(len(gate_outputs)), gate_outputs, alpha=0.5, color="red", marker=".", s=1, label="predicted")
    ax.set_xlabel("Frames (Green target, Red predicted)")
    ax.set_ylabel("Gate State")
    fig.tight_layout()
    data = _plot_to_numpy(fig)
    plt.close(fig)
    return data


class TrainLogger:
    def __init__(self, log_dir: str, name: str):
        # multi-host: only process 0 writes (two processes appending event
        # files to one dir makes TensorBoard's restart detection purge
        # steps nondeterministically)
        import jax

        self.enabled = jax.process_index() == 0
        self.writer = None
        if self.enabled:
            import os

            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(os.path.join(log_dir, name))

    def scalars(self, metrics: Dict[str, float], step: int, prefix: str = "") -> None:
        if not self.enabled:
            return
        for k, v in metrics.items():
            self.writer.add_scalar(prefix + k, float(v), step)

    def validation_images(self, firsts: Dict[str, np.ndarray], mel_len: int, chars_len: int, step: int) -> None:
        """First-val-batch images only, like the reference (batch_idx == 0)."""
        if not self.enabled:
            return
        gt = np.asarray(firsts["mel_spectrogram"])[:mel_len].T
        pred = np.asarray(firsts["mel_spectrogram_pred"])[:mel_len].T
        align = np.asarray(firsts["alignment"])[:mel_len, :chars_len].T
        gate_t = np.asarray(firsts["gate"]).squeeze()
        logits = np.asarray(firsts["gate_pred"]).squeeze()
        gate_p = np.where(  # numerically stable sigmoid (logits reach -1000)
            logits >= 0,
            1.0 / (1.0 + np.exp(-np.clip(logits, 0, None))),
            np.exp(np.clip(logits, None, 0)) / (1.0 + np.exp(np.clip(logits, None, 0))),
        )
        self.writer.add_image("val_mel_spectrogram", plot_spectrogram(gt), step, dataformats="HWC")
        self.writer.add_image("val_mel_spectrogram_predicted", plot_spectrogram(pred), step, dataformats="HWC")
        self.writer.add_image("val_alignment", plot_alignment(align), step, dataformats="HWC")
        self.writer.add_image("val_gate", plot_gate(gate_t, gate_p), step, dataformats="HWC")

    def histograms(self, params, step: int) -> None:
        if not self.enabled:
            return
        import jax

        for path_keys, leaf in jax.tree_util.tree_leaves_with_path(params):
            name = "/".join(
                str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k)))) for k in path_keys
            )
            self.writer.add_histogram(name, np.asarray(leaf), step)

    def flush(self) -> None:
        if self.enabled:
            self.writer.flush()

    def close(self) -> None:
        if self.enabled:
            self.writer.close()

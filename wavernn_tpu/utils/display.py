"""Console + plot observability (reference utils/display.py)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np


def stream(message: str):
    """Carriage-return status line (display.py:9)."""
    sys.stdout.write(f"\r{message}")
    sys.stdout.flush()


def progbar(i, n, size: int = 16) -> str:
    done = (i * size) // max(n, 1)
    return "█" * done + "░" * (size - done)


def simple_table(item_tuples):
    """Boxed config table (display.py:21-69)."""
    border_pattern = "+---------------------------------------"
    whitespace = "                                            "
    headings, cells = [], []
    for item in item_tuples:
        heading, cell = str(item[0]), str(item[1])
        pad_head = True
        while len(heading) < len(cell):
            heading += " " if pad_head else ""
            heading = " " + heading if pad_head else heading
            pad_head = not pad_head
        while len(cell) < len(heading):
            cell += " "
        headings.append(heading)
        cells.append(cell)
    border, head, body = "", "", ""
    for i in range(len(item_tuples)):
        pad = " " if i > 0 else ""
        head += pad + headings[i] + " |"
        body += pad + cells[i] + " |"
        border += border_pattern[: len(headings[i]) + 2] + "+"
    print(border, f"|{head}", border, f"|{body}", border, sep="\n")
    print(" ")


def time_since(started) -> str:
    elapsed = time.time() - started
    m = int(elapsed // 60)
    s = int(elapsed % 60)
    if m >= 60:
        h = int(m // 60)
        m = m % 60
        return f"{h}h {m}m {s}s"
    return f"{m}m {s}s"


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def save_attention(attn, path):
    """Attention map -> png (display.py:84-90)."""
    plt = _plt()
    fig = plt.figure(figsize=(12, 6))
    plt.imshow(np.asarray(attn).T, interpolation="nearest", aspect="auto")
    fig.savefig(f"{path}.png", bbox_inches="tight")
    plt.close(fig)


def save_spectrogram(M, path, length=None):
    plt = _plt()
    M = np.flip(np.asarray(M), axis=0)
    if length:
        M = M[:, :length]
    fig = plt.figure(figsize=(12, 6))
    plt.imshow(M, interpolation="nearest", aspect="auto")
    fig.savefig(f"{path}.png", bbox_inches="tight")
    plt.close(fig)


def plot(array, path=None):
    """Interactive waveform/curve plot for notebook sessions
    (reference utils/display.py:100-111). Shows the figure when a GUI
    backend is live; pass ``path`` to save a png instead (headless)."""
    plt = _plt()
    fig = plt.figure(figsize=(30, 5))
    ax = fig.add_subplot(111)
    for axis in (ax.xaxis, ax.yaxis):
        axis.label.set_color("grey")
        axis.label.set_fontsize(23)
    ax.tick_params(axis="x", colors="grey", labelsize=23)
    ax.tick_params(axis="y", colors="grey", labelsize=23)
    ax.plot(np.asarray(array))
    if path is not None:
        fig.savefig(f"{path}.png", bbox_inches="tight")
        plt.close(fig)
        return
    plt.show()


def plot_spec(M, path=None):
    """Interactive spectrogram plot (reference utils/display.py:114-120);
    pass ``path`` to save a png instead (headless)."""
    plt = _plt()
    fig = plt.figure(figsize=(18, 4))
    plt.imshow(np.flip(np.asarray(M), axis=0), interpolation="nearest",
               aspect="auto")
    if path is not None:
        fig.savefig(f"{path}.png", bbox_inches="tight")
        plt.close(fig)
        return
    plt.show()

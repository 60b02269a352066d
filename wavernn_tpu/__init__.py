"""wavernn_tpu — a TPU-native neural TTS framework.

Two-stage pipeline with the full capability surface of qingyundou/WaveRNN:
Tacotron (text -> mel, location-sensitive smooth attention, attention-forcing
training modes) and WaveRNN (mel -> waveform, RAW-softmax / MOL / coarse-fine
variants), rebuilt TPU-first on JAX/XLA/Pallas/pjit.
"""

__version__ = "0.1.0"

from .config import (
    Config,
    DSPConfig,
    TacotronConfig,
    TacotronTrainConfig,
    WaveRNNConfig,
    WaveRNNTrainConfig,
)
from .paths import Workspace

__all__ = [
    "Config", "DSPConfig", "TacotronConfig", "TacotronTrainConfig",
    "WaveRNNConfig", "WaveRNNTrainConfig", "Workspace", "__version__",
]

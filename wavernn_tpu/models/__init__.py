"""Model families: fatchord WaveRNN (RAW/MOL), Tacotron, DeepMind
coarse/fine WaveRNN, and the MOL distribution."""
from . import deepmind, distribution, tacotron, wavernn

__all__ = ["deepmind", "distribution", "tacotron", "wavernn"]

"""TPU-native DSP stack (replaces reference utils/dsp.py; no librosa)."""
from .audio import (
    combine_signal,
    de_emphasis,
    decode_mu_law,
    encode_16bits,
    encode_mu_law,
    float_2_label,
    label_2_float,
    load_wav,
    pre_emphasis,
    save_wav,
    split_signal,
)
from .mel import (
    amp_to_db,
    db_to_amp,
    denormalize,
    hann_window,
    istft_np,
    mel_filterbank,
    melspectrogram_jax,
    melspectrogram_np,
    normalize,
    spectrogram_np,
    stft_jax,
    stft_np,
)
from .griffinlim import griffinlim_jax, istft_jax, mel_to_stft_jax, reconstruct_waveform

__all__ = [
    "combine_signal", "de_emphasis", "decode_mu_law", "encode_16bits",
    "encode_mu_law", "float_2_label", "label_2_float", "load_wav",
    "pre_emphasis", "save_wav", "split_signal",
    "amp_to_db", "db_to_amp", "denormalize", "hann_window", "istft_np",
    "mel_filterbank", "melspectrogram_jax", "melspectrogram_np", "normalize",
    "spectrogram_np", "stft_jax", "stft_np",
    "griffinlim_jax", "istft_jax", "mel_to_stft_jax", "reconstruct_waveform",
]

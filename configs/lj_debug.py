"""lj_debug — from-scratch LJSpeech training at full length.

No warm start, full reference schedules (root hparams.py defaults:
1M vocoder steps, 350k-step progressive TTS schedule) under a scratch
experiment id — the recipe for reproducing the pretrained checkpoints from
nothing (reference scripts/hparams_debug.py).
"""

exp_id = "lj_debug"
voc_model_id = exp_id
tts_model_id = exp_id

wav_path = "data/wavs"
data_path = "data/"

mode = "teacher_forcing"

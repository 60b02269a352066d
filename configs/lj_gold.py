"""lj_gold — teacher-forcing fine-tune from pretrained weights.

The "gold" model is the teacher-forcing Tacotron every attention-forcing
experiment measures against and forces with (reference
scripts/hparams_gold.py: shortened schedules + warm start from the
quick-start checkpoints). Only deltas from the framework defaults appear
here; everything else (DSP, model dims, clip norms, ...) comes from
wavernn_tpu/config.py.
"""

exp_id = "lj_gold"
voc_model_id = exp_id
tts_model_id = exp_id

wav_path = "data/wavs"
data_path = "data/"

# vocoder: short fine-tune on top of a pretrained 1M-step model
voc_total_steps = 50_000
voc_init_weights_path = "pretrained/voc_weights/latest_weights.npz"

# tts: compressed progressive schedule (reference gold halves each session)
tts_schedule = [
    (7, 1e-3, 10_000, 32),   # (r, lr, step, batch_size)
    (5, 1e-4, 20_000, 32),
    (2, 1e-4, 40_000, 16),
    (2, 1e-4, 80_000, 8),
]
tts_init_weights_path = "pretrained/tts_weights/latest_weights.npz"

mode = "teacher_forcing"

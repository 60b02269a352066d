"""lj_af_online_kl — online attention forcing with a KL attention loss.

A frozen gold teacher runs teacher-forcing on every batch to produce
attn_ref; the student runs attention-forcing against it and adds
``attn_loss_coeff * KL(smooth(student) || smooth(teacher))`` (reference
scripts/hparams_af_online_kl_tune.py — its tuning sweep varied the coeff;
1.0 is the fork's recorded pick).
"""

attn_loss_coeff = 1.0
exp_id = f"lj_af_online_kl{attn_loss_coeff}"
voc_model_id = exp_id
tts_model_id = exp_id

wav_path = "data/wavs"
data_path = "data/"
random_seed = 16
ignore_voc = True  # TTS-only experiment; vocoder comes from gold

tts_schedule = [
    (2, 1e-3, 10_000, 32),
    (2, 1e-4, 20_000, 32),
    (2, 1e-4, 40_000, 16),
    (2, 1e-4, 80_000, 8),
]
tts_init_weights_path = "checkpoints/lj_gold.tacotron/latest_weights.npz"

mode = "attention_forcing_online"
model_tf_path = tts_init_weights_path

# fixed-name end-to-end synthesis set (gen_tacotron picks these up)
test_sentences_file = "test_sentences/sentences_espnet.txt"
test_sentences_names = [
    "LJ050-0029_gen", "LJ050-0030_gen", "LJ050-0031_gen",
    "LJ050-0032_gen", "LJ050-0033_gen",
]

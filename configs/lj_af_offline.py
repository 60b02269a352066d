"""lj_af_offline — attention forcing against on-disk attention references.

Prerequisites: run the lj_gold config, then export its attention maps with
``python -m wavernn_tpu.cli.train_tacotron --hp_file configs/lj_gold.py
--force_attn`` (writes data/attn_lj_gold/). The student then trains with
its own generated prev-frames but the gold model's attention, plus an L1
loss pulling its attention toward the reference (reference
scripts/hparams_af_offline.py).
"""

exp_id = "lj_af_offline"
voc_model_id = exp_id
tts_model_id = exp_id

wav_path = "data/wavs"
data_path = "data/"
random_seed = 16

voc_total_steps = 50_000
voc_init_weights_path = "pretrained/voc_weights/latest_weights.npz"

# AF trains at the final reduction factor only
tts_schedule = [
    (2, 1e-3, 10_000, 32),
    (2, 1e-4, 20_000, 32),
    (2, 1e-4, 40_000, 16),
    (2, 1e-4, 80_000, 8),
]
tts_init_weights_path = "checkpoints/lj_gold.tacotron/latest_weights.npz"

mode = "attention_forcing_offline"
attn_loss_coeff = 200.0
attn_ref_path = "attn_lj_gold"
model_tf_path = tts_init_weights_path

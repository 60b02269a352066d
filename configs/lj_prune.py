"""lj_prune — pruned-vocoder training (TPU extension of record).

Productionises the reference's pruning prototype (notebooks/Pruning -
Scratchpad.ipynb cells 4-5): cubic sparsity schedule to 93.75% with
(128,128) blocks so the zero pattern aligns to MXU tiles, which is what
lets serving run the gather-free block-sparse kernel schedule
(ops/pallas_gen.pack_sparse + sparse_packed on every serving entry point)
at ~0.6x the dense step time instead of merely storing zeros.
"""

exp_id = "lj_prune"
voc_model_id = exp_id
tts_model_id = "lj_gold"  # reuse the gold Tacotron

wav_path = "data/wavs"
data_path = "data/"

voc_total_steps = 500_000
voc_prune = True
voc_prune_start = 20_000       # t0: dense warmup before masks move
voc_prune_steps = 200_000      # S: cubic ramp length
voc_prune_sparsity = 0.9375    # Z: the notebook's target
voc_prune_every = 500
voc_prune_block = (128, 128)   # MXU-tile blocks -> sparse serving schedule

mode = "teacher_forcing"

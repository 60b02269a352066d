"""Observability wiring (VERDICT r2 item 5): the JSONL metrics stream and
profiler hooks are exercised through the PRODUCTION train loops, not just
as units."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from wavernn_tpu.config import Config, DSPConfig, WaveRNNConfig, \
    WaveRNNTrainConfig
from wavernn_tpu.models import wavernn as wr
from wavernn_tpu.paths import Workspace
from wavernn_tpu.train import wavernn_train as wt
from wavernn_tpu.utils.metrics import MetricsLogger, StepTimer

DSP = DSPConfig()


def _voc():
    return WaveRNNConfig(mode="MOL", rnn_dims=32, fc_dims=32,
                         compute_dims=16, res_out_dims=16, res_blocks=1,
                         pad=2, upsample_factors=(5, 5, 11))


def _batches(rng, voc, n, B=4, frames=7):
    T = (frames - 2 * voc.pad) * DSP.hop_length
    return [(rng.uniform(-1, 1, (B, T)).astype(np.float32),
             rng.uniform(-1, 1, (B, T)).astype(np.float32),
             rng.uniform(0, 1, (B, DSP.num_mels, frames)).astype(np.float32))
            for _ in range(n)]


def test_metrics_logger_roundtrip(tmp_path):
    log = MetricsLogger(tmp_path / "m.jsonl")
    log.log(event="a", step=1, loss=0.5)
    log.log(event="b", step=2)
    rows = MetricsLogger(tmp_path / "m.jsonl").read()
    assert [r["event"] for r in rows] == ["a", "b"]
    assert rows[0]["loss"] == 0.5
    assert all("wall" in r for r in rows)


def test_step_timer():
    t = StepTimer(window=10)
    assert t.steps_per_sec == 0.0
    for _ in range(5):
        t.tick()
        time.sleep(0.01)
    assert 10 < t.steps_per_sec < 1000


def test_train_loop_writes_metrics_jsonl(tmp_path, rng):
    """Epoch + checkpoint records land in workspace.voc_metrics."""
    voc = _voc()
    cfg = Config(voc=voc, voc_train=WaveRNNTrainConfig(
        batch_size=4, total_steps=4, checkpoint_every=2))
    ws = Workspace(tmp_path / "data", "vm", "tm", output_root=tmp_path)
    state = wt.create_train_state(jax.random.PRNGKey(0), voc, DSP, lr=1e-3)
    wt.train_loop(cfg, ws, _batches(rng, voc, 4), state, lr=1e-3,
                  total_steps=4, log=lambda *a: None)
    rows = MetricsLogger(ws.voc_metrics).read()
    events = [r["event"] for r in rows]
    assert events.count("checkpoint") == 2   # steps 2 and 4
    assert events.count("epoch") >= 1
    ck = [r for r in rows if r["event"] == "checkpoint"]
    assert ck[0]["step"] == 2 and ck[1]["step"] == 4
    assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)


def test_train_loop_profile_dir(tmp_path, rng):
    """--profile_dir wiring: a jax.profiler trace is captured around the
    first steps and lands on disk."""
    voc = _voc()
    cfg = Config(voc=voc, voc_train=WaveRNNTrainConfig(
        batch_size=4, total_steps=2, checkpoint_every=1000))
    ws = Workspace(tmp_path / "data", "vp", "tp", output_root=tmp_path)
    state = wt.create_train_state(jax.random.PRNGKey(0), voc, DSP, lr=1e-3)
    prof = tmp_path / "trace"
    wt.train_loop(cfg, ws, _batches(rng, voc, 2), state, lr=1e-3,
                  total_steps=2, log=lambda *a: None,
                  profile_dir=prof, profile_steps=1)
    traces = list(prof.rglob("*.xplane.pb")) + list(prof.rglob("*.trace*"))
    assert traces, list(prof.rglob("*"))


def test_tts_train_loop_writes_metrics_jsonl(tmp_path, rng):
    from wavernn_tpu.config import TacotronConfig, TacotronTrainConfig
    from wavernn_tpu.train import tacotron_train as tt

    tts = TacotronConfig(embed_dims=16, encoder_dims=128, decoder_dims=256,
                         postnet_dims=16, encoder_K=2, lstm_dims=32,
                         postnet_K=2, num_highways=1)
    r = 2
    cfg = Config(tts=tts, tts_train=TacotronTrainConfig(
        schedule=((r, 1e-3, 2, 4),), checkpoint_every=2))
    chars = rng.randint(1, 148, (4, 8)).astype(np.int64)
    mel = rng.uniform(-4, 4, (4, DSP.num_mels, 6 * r)).astype(np.float32)
    batch = (chars, mel, ["a", "b", "c", "d"], [6 * r] * 4)
    ws = Workspace(tmp_path / "data", "v", "tts_m", output_root=tmp_path)
    state = tt.create_train_state(jax.random.PRNGKey(0), tts, DSP.num_mels,
                                  1e-3)
    tt.train_loop(cfg, ws, state, lambda r_, bs: [batch] * 2,
                  key=jax.random.PRNGKey(1), log=lambda *a: None)
    rows = MetricsLogger(ws.tts_metrics).read()
    events = [r["event"] for r in rows]
    assert "checkpoint" in events and "session" in events
    assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)

"""CLI flag-surface parity with the reference entry points (argparse level:
every reference flag is accepted here — reference gen_wavernn.py:71-80,
gen_tacotron.py:17-40, train_wavernn.py:22-27, train_tacotron.py:26-30,
preprocess.py:22-25, quick_start.py:28-32)."""
import contextlib
import io

import pytest


def _help(main, argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf), pytest.raises(SystemExit) as exc:
        main(argv)
    assert exc.value.code == 0
    return buf.getvalue()


@pytest.mark.parametrize("module,argv,flags", [
    ("gen_wavernn", ["--help"],
     ["--batched", "--unbatched", "--samples", "--target", "--overlap",
      "--file", "--voc_weights", "--gta", "--force_cpu", "--hp_file"]),
    ("gen_tacotron", ["--help"],
     ["--input_text", "--save_attention", "--force_cpu", "--hp_file"]),
    ("gen_tacotron", ["wavernn", "--help"],
     ["--batched", "--unbatched", "--target", "--overlap", "--voc_weights",
      "--tts_weights", "--fast"]),
    ("gen_tacotron", ["griffinlim", "--help"], ["--iters"]),
    ("train_wavernn", ["--help"],
     ["--lr", "--batch_size", "--force_train", "--gta", "--force_cpu",
      "--hp_file", "--prune", "--profile_dir"]),
    ("train_tacotron", ["--help"],
     ["--force_train", "--force_gta", "--force_attn", "--force_cpu",
      "--hp_file", "--profile_dir"]),
    ("preprocess", ["--help"],
     ["--path", "--extension", "--num_workers", "--force_cpu", "--hp_file"]),
    ("quick_start", ["--help"],
     ["--input_text", "--batched", "--unbatched", "--force_cpu",
      "--hp_file"]),
])
def test_reference_flags_accepted(module, argv, flags):
    import importlib
    mod = importlib.import_module(f"wavernn_tpu.cli.{module}")
    text = _help(mod.main, argv)
    for flag in flags:
        assert flag in text, f"{module} {argv}: missing {flag}"


def test_force_cpu_backend_selects_cpu():
    """In the test harness jax is already pinned to CPU, so the helper is a
    no-op that must not warn or raise."""
    from wavernn_tpu.cli.common import force_cpu_backend
    import jax
    force_cpu_backend()
    assert jax.devices()[0].platform == "cpu"

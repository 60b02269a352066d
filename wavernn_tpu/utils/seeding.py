"""Global seeding (reference utils/__init__.py:107-121).

JAX PRNG keys are explicit and threaded through call sites; this seeds the
remaining ambient generators (numpy/random, used by the data pipeline and
any torch interop) for reproducible runs when hparams define
``random_seed`` (train_tacotron.py:36-37).
"""
from __future__ import annotations

import random

import numpy as np


def set_global_seeds(i: int):
    np.random.seed(i)
    random.seed(i)
    try:
        import torch
        torch.manual_seed(i)
    except ImportError:
        pass

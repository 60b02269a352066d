#!/usr/bin/env python
"""On-TPU correctness gate for the Pallas sample-loop kernel (standalone).

Thin CLI over wavernn_tpu.benchmarks.parity_checks(): runs the scan oracle
and the Pallas kernel on the live backend with identical injected noise and
gates on waveform agreement. bench.py embeds the same checks; this script
exists for running the gate by itself (exit code 0 iff parity_ok).
"""
import json
import sys


def main():
    from wavernn_tpu.benchmarks import parity_checks

    out = parity_checks()
    print(json.dumps(out))
    return 0 if out["parity_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

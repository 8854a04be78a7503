"""Smoke-run every example's main() (VERDICT r4 item 7).

The examples are chip-oriented demos; this keeps them from rotting by
importing and running each one's main path on the CPU test platform.
Each example is self-contained with modest sizes, so main() runs as-is;
the marginally heavier ones are trimmed by monkeypatching their
module-level size constants before main() runs (the constants are read
inside main, not at import time).

stdout is captured (the examples print tables) — the assertion surface
is each example's own internal asserts (error-free decode at design SNR,
expected failure of the fixed-loading comparison, etc.).
"""

import importlib
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")

#: module-level constants to shrink per example (applied post-import)
_TRIMS = {
    "ber_waterfall": {},
    "adaptive_loading": {},
    "control_channel": {"N_BURSTS": 16},
    "burst_modem": {},
    "ofdm_link": {},
    "production_pipeline": {},
    "sharded_bank": {},
    "streaming_resume": {},
    "wideband_bank": {},
}


@pytest.fixture(scope="module")
def examples_path():
    sys.path.insert(0, EXAMPLES_DIR)
    yield
    sys.path.remove(EXAMPLES_DIR)


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.slow) if n in
     ("control_channel", "ber_waterfall", "ofdm_link") else n
     for n in sorted(_TRIMS)])
def test_example_main_runs(name, examples_path, capsys):
    mod = importlib.import_module(name)
    for attr, val in _TRIMS[name].items():
        assert hasattr(mod, attr), f"{name}.{attr} gone — update _TRIMS"
        setattr(mod, attr, val)
    mod.main()
    out = capsys.readouterr().out
    assert out.strip(), f"{name}.main() printed nothing"

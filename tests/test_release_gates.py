"""The bench_ber.py release gates, kept green in the default suite
(VERDICT r2 item 8). Each gate is a Monte-Carlo point with explicit
pass/fail tolerances — see :func:`modem_tpu.harness.release_gates`."""

import pytest

from modem_tpu.harness import (
    mpsk_ber_theory, mqam_ber_theory, rayleigh_ber_theory, release_gates)


@pytest.fixture(scope="module")
def gates():
    return {g["gate"]: g for g in release_gates(seed=0)}


def test_all_gates_pass(gates):
    failed = [n for n, g in gates.items() if not g["passed"]]
    assert not failed, failed


def test_theory_helpers_sane():
    # gray 8-PSK beats the natural-binary map by the average cyclic
    # adjacent flip count: sum(popcount(i ^ (i+1 mod 8)))/8 = 14/8 = 1.75
    nat = mpsk_ber_theory(12.0, 8)
    gray = mpsk_ber_theory(12.0, 8, gray=True)
    assert nat / gray == pytest.approx(1.75)
    # gray 16-QAM beats natural binary by the flip factor 4/3
    assert (mqam_ber_theory(14.0, 16) /
            mqam_ber_theory(14.0, 16, gray=True)) == pytest.approx(4 / 3)
    # Rayleigh at 12 dB ~1.5e-2, far above the AWGN Q-function
    assert 0.01 < rayleigh_ber_theory(12.0) < 0.02


def test_gate_statistics_sufficient(gates):
    for name in ("8psk_awgn_vs_theory", "qam16_gray_awgn_vs_theory",
                 "ofdm_qpsk_rayleigh_vs_theory"):
        assert gates[name]["errors"] > 1000, name

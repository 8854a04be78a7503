"""Block TX vs golden per-sample model, for all 15 CLI scheme configs.

Covers: baseband (--iq) parity, passband parity, preamble path, and streaming
state continuity (chunked block processing must be bit-identical to one shot).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import Modulator, Rates, make_scheme
from modem_tpu.models import SCHEME_NAMES

from golden import golden_modulate

SR = 10000
BR = 500  # sps = 20 (even, required by msk/oqpsk)
CF = 1000
N_SYM = 96


def _bits(name, rates, n_sym=N_SYM, seed=0):
    scheme = make_scheme(name, rates)
    rng = np.random.default_rng(seed)
    return scheme, rng.integers(0, 2, size=n_sym * scheme.bits_per_symbol)


@pytest.mark.parametrize("name", SCHEME_NAMES)
def test_baseband_matches_golden(name):
    rates = Rates(BR, SR)
    scheme, bits = _bits(name, rates)
    mod = Modulator(scheme, rates, CF)
    (i, q), _ = jax.jit(mod.baseband)(jnp.asarray(bits), mod.init_state())
    got = np.stack([np.asarray(i), np.asarray(q)], axis=-1)
    want = golden_modulate(name, bits, SR, BR, CF, mode="iq")
    tol = 2e-3 if name in ("dqpsk", "dbpsk") else 2e-4
    np.testing.assert_allclose(got, want, atol=tol)


@pytest.mark.parametrize("name", SCHEME_NAMES)
def test_passband_matches_golden(name):
    rates = Rates(BR, SR)
    scheme, bits = _bits(name, rates, seed=1)
    mod = Modulator(scheme, rates, CF)
    wave, _ = jax.jit(mod.passband)(jnp.asarray(bits), mod.init_state())
    want = golden_modulate(name, bits, SR, BR, CF, mode="passband")
    tol = 2e-3 if name in ("dqpsk", "dbpsk") else 3e-4
    np.testing.assert_allclose(np.asarray(wave), want, atol=tol)


@pytest.mark.parametrize("name", SCHEME_NAMES)
def test_streaming_chunks_match_one_shot(name):
    """Processing 4 chunks with carried TxState == one-shot block processing."""
    rates = Rates(BR, SR)
    scheme, bits = _bits(name, rates, seed=2)
    mod = Modulator(scheme, rates, CF)
    bits_j = jnp.asarray(bits)

    one, _ = jax.jit(mod.passband)(bits_j, mod.init_state())

    state = mod.init_state()
    bpsym = scheme.bits_per_symbol
    chunk = (N_SYM // 4) * bpsym
    outs = []
    step = jax.jit(mod.passband)
    for c in range(4):
        w, state = step(bits_j[c * chunk:(c + 1) * chunk], state)
        outs.append(w)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(o) for o in outs]), np.asarray(one), atol=1e-6
    )


@pytest.mark.parametrize("name", ["qpsk", "mfsk", "dqpsk", "msk"])
def test_preamble_then_digital_matches_golden(name):
    """Preamble tone + digital stream share the carrier sample counter
    (`modulate.rs:71,118-128`)."""
    rates = Rates(BR, SR)
    scheme, bits = _bits(name, rates, n_sym=32, seed=3)
    mod = Modulator(scheme, rates, CF)
    state = mod.init_state()
    pre, state = jax.jit(mod.preamble, static_argnums=0)(3, state)
    wave, _ = jax.jit(mod.passband)(jnp.asarray(bits), state)
    got = np.concatenate([np.asarray(pre), np.asarray(wave)])
    want = golden_modulate(name, bits, SR, BR, CF, mode="passband",
                           preamble_cycles=3)
    tol = 2e-3 if name in ("dqpsk", "dbpsk") else 3e-4
    np.testing.assert_allclose(got, want, atol=tol)


def test_batched_channels():
    """A [C, nbits] batch modulates each channel independently."""
    rates = Rates(BR, SR)
    scheme = make_scheme("qpsk", rates)
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, size=(4, 32 * 2))
    mod = Modulator(scheme, rates, CF)
    wave, _ = jax.jit(mod.passband)(jnp.asarray(bits), mod.init_state((4,)))
    assert wave.shape == (4, 32 * rates.samples_per_symbol)
    for c in range(4):
        want = golden_modulate("qpsk", bits[c], SR, BR, CF, mode="passband")
        np.testing.assert_allclose(np.asarray(wave[c]), want, atol=3e-4)


def test_batched_stateful_channels():
    """Stateful schemes (per-channel accumulators) batch correctly too."""
    rates = Rates(BR, SR)
    scheme = make_scheme("mfsk", rates)
    rng = np.random.default_rng(8)
    bits = rng.integers(0, 2, size=(3, 24 * 4))
    mod = Modulator(scheme, rates, CF)
    wave, _ = jax.jit(mod.passband)(jnp.asarray(bits), mod.init_state((3,)))
    for c in range(3):
        want = golden_modulate("mfsk", bits[c], SR, BR, CF, mode="passband")
        np.testing.assert_allclose(np.asarray(wave[c]), want, atol=3e-4)


class TestGrayQam:
    """QAM(gray=True): production Gray mapping next to the reference's
    natural-binary map (`qam.rs:32-38`, kept as the default)."""

    def test_adjacent_points_differ_in_one_bit(self):
        from modem_tpu.models.qam import QAM

        q = QAM(4, 0.0, 1.0, gray=True)
        lut = q.lut
        d2 = ((lut[:, None, :] - lut[None, :, :]) ** 2).sum(-1)
        dmin = d2[d2 > 1e-9].min()
        sym = np.arange(16)
        for a in range(16):
            for b in range(a + 1, 16):
                if abs(d2[a, b] - dmin) < 1e-9:
                    assert bin(a ^ b).count("1") == 1

    def test_gray_beats_natural_binary_ber(self):
        from modem_tpu.harness import ofdm_ber_point
        from modem_tpu.models.qam import QAM

        nat = ofdm_ber_point(QAM(4, 0.0, 1.0), 14.0, seed=1)
        gray = ofdm_ber_point(QAM(4, 0.0, 1.0, gray=True), 14.0, seed=1)
        assert nat.bit_errors > 200  # statistics
        assert gray.bit_errors < 0.85 * nat.bit_errors

    def test_roundtrip_exact(self):
        from modem_tpu.chain import PulseShapedChain
        from modem_tpu.models.qam import QAM

        chain = PulseShapedChain(QAM(6, 0.0, 1.0, gray=True),
                                 Rates(1250, 10000))
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, (2, 64 * 6)), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(chain.roundtrip(bits)), np.asarray(bits))


class TestGrayMpsk:
    def test_circle_neighbors_differ_in_one_bit(self):
        from modem_tpu.models.psk import MPSK

        p = MPSK(4, 0.0, 1.0, gray=True)
        ang = np.arctan2(p.lut[:, 1], p.lut[:, 0])
        order = np.argsort(ang)  # walk the circle
        for a, b in zip(order, np.roll(order, -1)):
            assert bin(int(a) ^ int(b)).count("1") == 1

    def test_roundtrip_and_ber_gain(self):
        from modem_tpu.harness import ofdm_ber_point
        from modem_tpu.models.psk import MPSK

        nat = ofdm_ber_point(MPSK(4, 0.0, 1.0), 14.0, seed=2)
        gray = ofdm_ber_point(MPSK(4, 0.0, 1.0, gray=True), 14.0, seed=2)
        assert nat.bit_errors > 200
        assert gray.bit_errors < 0.8 * nat.bit_errors


class TestGrayFusedConsistency:
    def test_gray_qam_excluded_from_algebraic_fast_path(self):
        """The algebraic fused QAM kernels hard-code the natural-binary
        level map, so gray=True must route through the LUT kernel —
        and the fused roundtrip must agree with the staged one."""
        from modem_tpu.chain import PulseShapedChain
        from modem_tpu.models.qam import QAM

        r = Rates(1250, 10000)
        gray = PulseShapedChain(QAM(4, 0.0, 1.0, gray=True), r)
        nat = PulseShapedChain(QAM(4, 0.0, 1.0), r)
        assert gray._txrx_params()[1] is None      # LUT path
        assert nat._txrx_params()[1] is not None   # algebraic path
        rng = np.random.default_rng(5)
        bits = jnp.asarray(rng.integers(0, 2, (2, 64 * 4)), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(gray.roundtrip_fused(bits)),
            np.asarray(gray.roundtrip(bits)))

"""FEC layer: convolutional encode/Viterbi decode + block interleaving
(modem_tpu/fec/).

Covers: noiseless roundtrip exactness, correction of injected bit errors
(hard), soft-beats-hard at fixed noise, the ML property against a brute-force
reference on a tiny code, and the full coded-modem loop: encode ->
interleave -> QPSK chain -> LLRs -> deinterleave -> Viterbi at an SNR where
the uncoded chain demonstrably fails.
"""

import itertools

import numpy as np

import jax
import jax.numpy as jnp

from modem_tpu import Rates, qpsk_reference_chain
from modem_tpu.fec import (
    ConvCode, block_deinterleave, block_interleave, ccsds_code,
)
from modem_tpu.ops.channel import awgn


class TestCodec:
    def test_noiseless_roundtrip_exact(self):
        code = ccsds_code()
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, (3, 200)), jnp.int32)
        c = code.encode(bits)
        assert c.shape == (3, 2 * (200 + 6))
        out = code.decode_hard(c)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_corrects_scattered_bit_errors(self):
        code = ccsds_code()
        rng = np.random.default_rng(1)
        bits = jnp.asarray(rng.integers(0, 2, (256,)), jnp.int32)
        c = np.array(code.encode(bits))  # writable copy
        # Flip well-separated code bits (inside the free-distance budget
        # per constraint length span).
        for pos in range(10, len(c) - 10, 40):
            c[pos] ^= 1
        out = code.decode_hard(jnp.asarray(c))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_ml_against_bruteforce_tiny_code(self):
        # K=3, rate 1/2 (g = 7/5): enumerate all 2^10 messages and check the
        # Viterbi decision is the Hamming-ML codeword for noisy receptions.
        code = ConvCode(3, (0o7, 0o5))
        msgs = np.array(list(itertools.product([0, 1], repeat=10)), np.int32)
        book = np.asarray(code.encode(jnp.asarray(msgs)))  # [1024, 24]
        rng = np.random.default_rng(2)
        for _ in range(20):
            m = msgs[rng.integers(0, len(msgs))]
            c = np.array(code.encode(jnp.asarray(m)))
            r = c.copy()
            flips = rng.choice(len(r), size=3, replace=False)
            r[flips] ^= 1
            got = np.asarray(code.decode_hard(jnp.asarray(r)))
            d = np.sum(book != r[None, :], axis=-1)
            best = d.min()
            got_cw = np.asarray(code.encode(jnp.asarray(got)))
            assert np.sum(got_cw != r) == best  # an ML codeword

    def test_soft_beats_hard(self):
        code = ccsds_code()
        rng = np.random.default_rng(3)
        bits = jnp.asarray(rng.integers(0, 2, (64, 128)), jnp.int32)
        c = np.asarray(code.encode(bits)).astype(np.float32)
        # BPSK over AWGN at an Eb/N0 where hard decisions lose ~2 dB.
        x = 1.0 - 2.0 * c
        sigma = 0.7  # Eb/N0 ~ 3.1 dB: soft decodes nearly clean, hard does not
        y = x + sigma * rng.normal(size=x.shape).astype(np.float32)
        llr = jnp.asarray(2.0 * y / sigma**2)  # positive = bit 0
        hard_in = jnp.asarray((y < 0).astype(np.int32))
        err_soft = int(jnp.sum(code.decode_soft(llr) != bits))
        err_hard = int(jnp.sum(code.decode_hard(hard_in) != bits))
        assert err_soft < err_hard / 3
        assert err_soft <= bits.size // 500

    def test_jittable_and_batched(self):
        code = ccsds_code()
        rng = np.random.default_rng(4)
        bits = jnp.asarray(rng.integers(0, 2, (4, 96)), jnp.int32)
        enc = jax.jit(code.encode)
        dec = jax.jit(code.decode_hard)
        np.testing.assert_array_equal(
            np.asarray(dec(enc(bits))), np.asarray(bits))


class TestInterleave:
    def test_roundtrip(self):
        rng = np.random.default_rng(5)
        bits = jnp.asarray(rng.integers(0, 2, (2, 3, 96)), jnp.int32)
        for rows in (2, 4, 8, 12):
            out = block_deinterleave(block_interleave(bits, rows), rows)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_spreads_a_burst(self):
        rows = 8
        l = 128
        x = np.zeros(l, np.int32)
        x[40:48] = 1  # 8-bit burst
        y = np.asarray(block_deinterleave(jnp.asarray(x), rows))
        idx = np.nonzero(y)[0]
        assert np.min(np.diff(idx)) >= l // rows - 1


class TestCodedModem:
    RATES = Rates(baud_rate=1250, sample_rate=10000)

    def _coded_run(self, snr_db, seed=6):
        """bits -> encode -> interleave -> QPSK chain + AWGN -> LLRs ->
        deinterleave -> Viterbi; returns (uncoded_errs, coded_errs, n)."""
        code = ccsds_code()
        chain = qpsk_reference_chain(self.RATES)
        rng = np.random.default_rng(seed)
        data = jnp.asarray(rng.integers(0, 2, (8, 250)), jnp.int32)
        cbits = code.encode(data)                      # [..., 512]
        tx_bits = block_interleave(cbits, rows=8)
        i, q = chain.tx(tx_bits)
        ni, nq = awgn(jax.random.key(seed), i, q, snr_db=snr_db)
        k = tx_bits.shape[-1] // 2
        # Per-rail noise variance at the matched-filter decision point is
        # N0/2 = P/(2*SNR) * (sum h^2) with unit-energy RRC -> P/(2*SNR).
        p = float(jnp.mean(i * i + q * q))
        nv = p / (2.0 * 10.0 ** (snr_db / 10.0))
        llr = chain.rx_soft((ni, nq), k, noise_var=nv)
        dec = code.decode_soft(block_deinterleave(llr, rows=8))
        hard = chain.rx((ni, nq), k)
        uncoded = int(jnp.sum(hard != tx_bits))
        coded = int(jnp.sum(dec != data))
        return uncoded, coded, data.size

    def test_coding_gain_end_to_end(self):
        # -5 dB per-waveform-sample SNR (the matched filter adds
        # 10*log10(sps) ~ 9 dB, so ~4 dB Es/N0 at the decision point): the
        # uncoded chain has a clear error floor; the K=7 code cleans it to 0.
        uncoded, coded, n = self._coded_run(snr_db=-5.0)
        assert uncoded > 50  # channel genuinely bad
        assert coded == 0

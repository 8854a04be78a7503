"""SC-FDE modem (modem_tpu/scfde.py): unitary transforms, CP-contained
multipath equalization, the symbol-spreading contrast with OFDM, soft
LLRs, and the FramedLink adapter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import Rates, make_scheme
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import multipath_fir
from modem_tpu.scfde import ScFdeChain, ScFdeModem

RATES = Rates(baud_rate=1250, sample_rate=10000)
N_BLOCKS = 6

# a CP-short dispersive channel with a deep in-band null
CH_I = np.array([1.0, 0.0, 0.0, -0.85], np.float32)
CH_Q = np.array([0.0, 0.25, 0.0, 0.1], np.float32)


def _modem(name="qpsk", **kw):
    return ScFdeModem(make_scheme(name, RATES), **kw)


def _bits(m, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 2, (channels, m.bits_per_frame(N_BLOCKS))),
        jnp.int32)


class TestRoundtrip:
    @pytest.mark.parametrize("name", ["qpsk", "qam16", "bpsk"])
    def test_flat_channel_exact(self, name):
        m = _modem(name)
        bits = _bits(m)
        i, q = m.tx_frame(bits)
        out = m.rx_frame(i, q, N_BLOCKS)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_cp_multipath_exact(self):
        """Any channel shorter than the CP is equalized exactly (noise-free,
        zero-forcing)."""
        m = _modem()
        bits = _bits(m, seed=1)
        i, q = m.tx_frame(bits)
        ci, cq = multipath_fir(i, q, CH_I, CH_Q)
        out = m.rx_frame(ci, cq, N_BLOCKS)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_training_blocks_are_cazac(self):
        """The ZC training block has constant amplitude in both domains
        (the property that makes the LS estimate numerically ideal)."""
        m = _modem()
        t = m._zc_i ** 2 + m._zc_q ** 2
        np.testing.assert_allclose(t, 1.0, atol=1e-6)
        np.testing.assert_allclose(m._zf_m2, 1.0, atol=1e-5)

    def test_channel_estimate_matches_truth(self):
        m = _modem()
        bits = _bits(m, seed=2)
        i, q = m.tx_frame(bits)
        ci, cq = multipath_fir(i, q, CH_I, CH_Q)
        p = m.preamble_len
        hi, hq = m.estimate_channel(ci[..., :p], cq[..., :p])
        # truth: DFT of the channel taps at all N bins
        k = np.arange(m.n)[:, None]
        ll = np.arange(len(CH_I))[None, :]
        ang = -2 * np.pi * k * ll / m.n
        want = (CH_I * np.cos(ang) - CH_Q * np.sin(ang)).sum(-1), \
               (CH_I * np.sin(ang) + CH_Q * np.cos(ang)).sum(-1)
        np.testing.assert_allclose(np.asarray(hi)[0], want[0], atol=1e-4)
        np.testing.assert_allclose(np.asarray(hq)[0], want[1], atol=1e-4)


class TestMmse:
    def test_mmse_beats_zf_under_null_and_noise(self):
        """With a deep in-band null and noise, MMSE weighting (noise_var >
        0) makes fewer bit errors than zero-forcing, which amplifies the
        nulled bins' noise."""
        m = _modem()
        rng = np.random.default_rng(3)
        bits = jnp.asarray(
            rng.integers(0, 2, (8, m.bits_per_frame(N_BLOCKS))), jnp.int32)
        i, q = m.tx_frame(bits)
        ci, cq = multipath_fir(i, q, CH_I, CH_Q)
        snr = 12.0
        p = float(jnp.mean(i * i + q * q))
        ci, cq = awgn(jax.random.key(4), ci, cq, snr, signal_power=p)
        nv = p / (10.0 ** (snr / 10.0))
        zf = int(jnp.sum(m.rx_frame(ci, cq, N_BLOCKS, 0.0) != bits))
        mmse = int(jnp.sum(m.rx_frame(ci, cq, N_BLOCKS, nv) != bits))
        assert mmse < zf, (mmse, zf)

    def test_spectral_null_spreads_instead_of_erasing(self):
        """The SC-FDE property: a deep null costs a little SNR on EVERY
        symbol instead of erasing the symbols of specific bins. Uncoded
        OFDM at the same SNR through the same channel concentrates errors
        in the nulled bins and loses; SC-FDE MMSE decodes clean."""
        from modem_tpu.ofdm import OfdmModem

        scheme = make_scheme("qpsk", RATES)
        m = _modem()
        rng = np.random.default_rng(5)
        bits = jnp.asarray(
            rng.integers(0, 2, (8, m.bits_per_frame(N_BLOCKS))), jnp.int32)
        i, q = m.tx_frame(bits)
        ci, cq = multipath_fir(i, q, CH_I, CH_Q)
        snr = 16.0
        p = float(jnp.mean(i * i + q * q))
        ci, cq = awgn(jax.random.key(6), ci, cq, snr, signal_power=p)
        nv = p / (10.0 ** (snr / 10.0))
        sc_errs = int(jnp.sum(m.rx_frame(ci, cq, N_BLOCKS, nv) != bits))

        om = OfdmModem(scheme)
        n_sym = 8
        obits = jnp.asarray(
            rng.integers(0, 2, (8, om.bits_per_frame(n_sym))), jnp.int32)
        oi, oq = om.tx_frame(obits)
        oci, ocq = multipath_fir(oi, oq, CH_I, CH_Q)
        po = float(jnp.mean(oi * oi + oq * oq))
        oci, ocq = awgn(jax.random.key(7), oci, ocq, snr, signal_power=po)
        ofdm_errs = int(jnp.sum(om.rx_frame(oci, ocq, n_sym) != obits))

        # the null costs SC-FDE a little SNR everywhere (a handful of
        # errors at most); it costs hard-decision OFDM its nulled bins
        assert ofdm_errs > 20, ofdm_errs
        assert sc_errs * 10 < ofdm_errs, (sc_errs, ofdm_errs)

    def test_soft_llr_signs_match_hard(self):
        m = _modem("qam16")
        bits = _bits(m, seed=8)
        i, q = m.tx_frame(bits)
        ci, cq = multipath_fir(i, q, CH_I, CH_Q)
        p = float(jnp.mean(i * i + q * q))
        ci, cq = awgn(jax.random.key(9), ci, cq, 25.0, signal_power=p)
        nv = p / (10.0 ** (25.0 / 10.0))
        hard = m.rx_frame(ci, cq, N_BLOCKS, nv)
        llr = m.rx_soft_frame(ci, cq, N_BLOCKS, nv)
        np.testing.assert_array_equal(
            np.asarray((llr < 0).astype(np.int32)), np.asarray(hard))


class TestFramedLink:
    def test_coded_link_over_nulled_channel(self):
        """FramedLink (CRC + scramble + conv + interleave) over the SC-FDE
        PHY through the deep-null channel: exact payloads, true CRCs."""
        from modem_tpu.link import FramedLink

        m = _modem()
        bpb = m.n * m.bits_per_symbol  # bits per SC-FDE block
        link = FramedLink(ScFdeChain(m), payload_bits=3 * bpb - 16 - 6,
                          interleave_rows=8)
        rng = np.random.default_rng(10)
        payload = jnp.asarray(
            rng.integers(0, 2, (3, link.payload_bits)), jnp.int32)
        i, q = link.tx(payload)
        ci, cq = multipath_fir(i, q, CH_I, CH_Q)
        snr = 10.0
        p = float(jnp.mean(i * i + q * q))
        ci, cq = awgn(jax.random.key(11), ci, cq, snr, signal_power=p)
        nv = p / (10.0 ** (snr / 10.0))
        out, ok = link.rx((ci, cq), nv)
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))


def test_channel_sharded_matches_single_device():
    """8 channels over an 8-device "ch" mesh through the generic channel
    sharding: bitwise parity with the single-device rx_frame."""
    from modem_tpu.parallel import channel_sharded, make_modem_mesh

    m = _modem()
    mesh = make_modem_mesh(ch=8)
    rng = np.random.default_rng(12)
    bits = jnp.asarray(
        rng.integers(0, 2, (8, m.bits_per_frame(N_BLOCKS))), jnp.int32)
    i, q = m.tx_frame(bits)
    ci, cq = multipath_fir(i, q, CH_I, CH_Q)

    def roundtrip(pair):
        return m.rx_frame(pair[..., 0, :], pair[..., 1, :], N_BLOCKS)

    pair = jnp.stack([ci, cq], axis=-2)
    ref = roundtrip(pair)
    out = channel_sharded(roundtrip, mesh)(pair)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(bits))


class TestAcquire:
    def test_blind_acquire_under_offset_cfo_gain(self):
        from modem_tpu.ops.impairments import apply_cfo, apply_gain_phase

        m = _modem()
        bits = _bits(m, channels=3, seed=14)
        i, q = m.tx_frame(bits)
        gap = jnp.zeros(i.shape[:-1] + (41,), i.dtype)
        ci = jnp.concatenate([gap, i], -1)
        cq = jnp.concatenate([gap, q], -1)
        ci, cq = multipath_fir(ci, cq, CH_I, CH_Q)
        # CFO within the sym_len-period estimator's range (< pi/sym_len)
        cfo_cps = 0.3 / m.sym_len  # cycles/sample
        ci, cq = apply_cfo(ci, cq, cfo_hz=cfo_cps, sample_rate=1)
        ci, cq = apply_gain_phase(ci, cq, gain=1.3, phase=-1.1)
        p = float(jnp.mean(ci * ci + cq * cq))
        ci, cq = awgn(jax.random.key(15), ci, cq, 30.0, signal_power=p)
        nv = p / (10.0 ** (30.0 / 10.0))
        out, rep = m.acquire(ci, cq, N_BLOCKS, max_lag=128, noise_var=nv)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))
        assert np.all(np.abs(np.asarray(rep["start"]) - 41) <= 4)
        cfo_true = 2 * np.pi * cfo_cps
        assert np.all(np.abs(np.asarray(rep["cfo_rad_per_sample"])
                             - cfo_true) < 0.1 * cfo_true + 1e-4)
        # the default matmul frame aligner is EXACTLY the gather form
        fi_m, fq_m, _ = m.locate_frame(ci, cq, N_BLOCKS, max_lag=128,
                                       aligner="matmul")
        fi_g, fq_g, _ = m.locate_frame(ci, cq, N_BLOCKS, max_lag=128,
                                       aligner="gather")
        np.testing.assert_array_equal(np.asarray(fi_m), np.asarray(fi_g))
        np.testing.assert_array_equal(np.asarray(fq_m), np.asarray(fq_g))

    def test_stream_receiver_works_on_scfde(self):
        """The burst stream receiver is waveform-agnostic: SC-FDE frames in
        a noisy stream are detected and decoded exactly."""
        from modem_tpu import OfdmStreamReceiver

        m = _modem()
        rng = np.random.default_rng(16)
        bits = [jnp.asarray(rng.integers(
            0, 2, m.bits_per_frame(N_BLOCKS)), jnp.int32)
            for _ in range(2)]
        amp = 10.0 ** (-30.0 / 20.0)
        segs_i, segs_q, starts, pos = [], [], [], 0
        for g, b in [(97, bits[0]), (230, bits[1]), (60, None)]:
            segs_i.append(amp * rng.standard_normal(g).astype(np.float32))
            segs_q.append(amp * rng.standard_normal(g).astype(np.float32))
            pos += g
            if b is None:
                break
            i, q = m.tx_frame(b)
            segs_i.append(np.asarray(i))
            segs_q.append(np.asarray(q))
            starts.append(pos)
            pos += i.shape[-1]
        si = np.concatenate(segs_i)
        sq = np.concatenate(segs_q)
        rxr = OfdmStreamReceiver(m, N_BLOCKS)
        frames = rxr.push(jnp.asarray(si), jnp.asarray(sq)) + rxr.flush()
        assert len(frames) == 2
        for (got, rep), want, t0 in zip(frames, bits, starts):
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(want))
            assert abs(rep["start"] - t0) <= 4

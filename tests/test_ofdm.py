"""OFDM modem (modem_tpu/ofdm.py): multicarrier TX/RX as MXU matmuls.

New capability (the reference is single-carrier everywhere); these tests
cover the grid math (unitary TX->RX), the one-tap equalizer under
CP-short multipath, pilot common-phase tracking under residual CFO, the
channel-weighted LLRs, and the blind Schmidl&Cox + LTF acquisition under
the full impairment stack at once.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import Rates, make_scheme
from modem_tpu.ofdm import OfdmModem
from modem_tpu.ops.channel import awgn
from modem_tpu.ops.impairments import (
    apply_cfo, apply_gain_phase, multipath_fir,
)
from modem_tpu.ops.llr import llr_hard_bits

RATES = Rates(baud_rate=1250, sample_rate=10000)
N_SYM = 12


def _modem(name="qpsk", **kw):
    return OfdmModem(make_scheme(name, RATES), **kw)


def _bits(modem, channels=2, n_symbols=N_SYM, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 2, (channels, modem.bits_per_frame(n_symbols))),
        jnp.int32)


# Complex channels with delay spread well inside the CP: MILD keeps every
# bin's |H|^2 above ~0.4 (hard decisions survive), FADED has a ~-21 dB
# spectral null (hard decisions on the faded bins fail at test SNR — the
# case channel-weighted LLRs + FEC exist for).
CH_MILD_I = np.array([1.0, 0.0, 0.15, 0.0, -0.05], np.float32)
CH_MILD_Q = np.array([0.0, 0.1, 0.0, 0.05, 0.0], np.float32)
CH_FADED_I = np.array([0.9, 0.0, 0.25, 0.0, -0.1], np.float32)
CH_FADED_Q = np.array([0.1, -0.3, 0.0, 0.12, 0.05], np.float32)


class TestGrid:
    def test_default_grid_is_80211_style(self):
        m = _modem()
        assert m.n_fft == 64 and m.cp == 16 and m.sym_len == 80
        assert m.n_data == 48 and len(m.pilot_bins) == 4
        assert set(m.pilot_bins) == {-21, -7, 7, 21}
        assert m.bits_per_frame(1) == 96  # QPSK on 48 data bins

    def test_validation(self):
        with pytest.raises(ValueError):
            _modem(data_bins=(1, 2), pilot_bins=(2,))  # overlap
        with pytest.raises(ValueError):
            _modem(data_bins=(0, 1), pilot_bins=())  # DC
        with pytest.raises(ValueError):
            _modem("mfsk")  # not a LUT scheme
        with pytest.raises(ValueError):
            _modem(pilot_bins=(-7, 7))  # pilots without data bins
        with pytest.raises(ValueError):
            _modem(n_ltf=0)  # no LTF -> no channel estimate

    @pytest.mark.parametrize("name", ["qpsk", "qam16", "qam256", "16psk"])
    def test_payload_roundtrip_exact(self, name):
        m = _modem(name)
        bits = _bits(m)
        i, q = m.tx_payload(bits)
        assert i.shape == (2, N_SYM * m.sym_len)
        out = m.rx_payload(i, q, N_SYM)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_equalized_points_hit_the_lut(self):
        m = _modem("qam16")
        bits = _bits(m, channels=1)
        i, q = m.tx_payload(bits)
        di, dq, m2 = m._equalize(i, q, N_SYM, None)
        # decision points must sit on constellation points to fp tolerance
        d = np.stack([np.asarray(di), np.asarray(dq)], -1).reshape(-1, 2)
        lut = np.asarray(m.lut)
        err = np.min(
            np.sum((d[:, None, :] - lut[None, :, :]) ** 2, -1), -1)
        assert float(err.max()) < 1e-8
        assert np.allclose(np.asarray(m2), 1.0)

    def test_n_fft_256_grid(self):
        """The grid generalizes to the MXU-native N=256 (208 used bins,
        scaled pilots): clean frame roundtrip and blind acquisition both
        exact."""
        m = _modem("qam16", n_fft=256, cp=64)
        assert m.n_fft == 256 and m.n_data == 204
        bits = _bits(m, n_symbols=6)
        i, q = m.tx_frame(bits)
        out = m.rx_frame(i, q, 6)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))
        gap = jnp.zeros(i.shape[:-1] + (29,), i.dtype)
        out2, rep = m.acquire(jnp.concatenate([gap, i], -1),
                              jnp.concatenate([gap, q], -1), 6,
                              max_lag=128)
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(bits))
        assert np.all(np.asarray(rep["start"]) == 29)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.slow
    def test_random_grid_property(self, seed):
        """Any legal grid (random FFT size, random data/pilot bin subsets,
        random LUT scheme) must roundtrip exactly and blind-acquire."""
        rng = np.random.default_rng(100 + seed)
        n_fft = int(rng.choice([32, 64, 128]))
        half = n_fft // 2 - 1
        bins = list(range(-half, 0)) + list(range(1, half + 1))
        rng.shuffle(bins)
        n_used = int(rng.integers(8, len(bins)))
        used = bins[:n_used]
        n_pil = int(rng.integers(2, 5))
        pilots = tuple(used[:n_pil])
        data = tuple(used[n_pil:])
        name = str(rng.choice(["qpsk", "qam16", "16psk", "bask"]))
        m = OfdmModem(make_scheme(name, RATES), n_fft=n_fft,
                      cp=n_fft // 4, data_bins=data, pilot_bins=pilots)
        bits = _bits(m, channels=2, n_symbols=6, seed=seed)
        i, q = m.tx_frame(bits)
        out = m.rx_frame(i, q, 6)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))
        gap = jnp.zeros(i.shape[:-1] + (17,), i.dtype)
        out2, _ = m.acquire(jnp.concatenate([gap, i], -1),
                            jnp.concatenate([gap, q], -1), 6, max_lag=64)
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(bits))

    def test_frame_roundtrip_clean(self):
        m = _modem()
        bits = _bits(m)
        i, q = m.tx_frame(bits)
        assert i.shape[-1] == m.frame_len(N_SYM)
        out = m.rx_frame(i, q, N_SYM)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


class TestEqualizer:
    def test_multipath_inside_cp_is_exact(self):
        m = _modem("qam16")
        bits = _bits(m)
        i, q = m.tx_frame(bits)
        ci, cq = multipath_fir(i, q, CH_MILD_I, CH_MILD_Q)
        ci, cq = apply_gain_phase(ci, cq, gain=0.7, phase=1.1)
        ci, cq = awgn(jax.random.PRNGKey(1), ci, cq, 30.0)
        out = m.rx_frame(ci, cq, N_SYM)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_pilot_cpe_tracks_residual_cfo(self):
        m = _modem()
        bits = _bits(m)
        i, q = m.tx_frame(bits)
        # ~0.02 subcarrier residual CFO: negligible ICI, but ~1.9 rad of
        # accumulated rotation by the last symbol — fatal without the
        # per-symbol pilot correction.
        ci, cq = apply_cfo(i, q, cfo_hz=0.002 / (2.0 * np.pi),
                           sample_rate=1)
        out = m.rx_frame(ci, cq, N_SYM)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_channel_denoise_projection(self):
        """Delay-subspace denoising: exact (to fp) on a CP-short channel
        without noise, and at low SNR it cuts decision errors vs the raw
        LS estimate."""
        m = _modem("qam16", channel_denoise=True)
        bits = _bits(m, channels=4, seed=19)
        i, q = m.tx_frame(bits)
        ci, cq = multipath_fir(i, q, CH_MILD_I, CH_MILD_Q)
        # noiseless: projection must not move a cp-short channel
        off, nl = m.sym_len, m.n_ltf * m.sym_len
        hr = m.estimate_channel(ci[..., off:off + nl],
                                cq[..., off:off + nl], denoise=False)
        hd = m.estimate_channel(ci[..., off:off + nl],
                                cq[..., off:off + nl], denoise=True)
        np.testing.assert_allclose(np.asarray(hd[0]), np.asarray(hr[0]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(hd[1]), np.asarray(hr[1]),
                                   atol=1e-4)
        # noisy: the projection averages estimation noise down by ~U/cp
        # (52/16 ~ 5 dB) — measure the estimator MSE against the TRUE
        # per-bin channel
        taps = (CH_MILD_I + 1j * CH_MILD_Q)
        k = np.asarray(m.used_bins)[:, None]
        h_true = (taps[None, :] * np.exp(
            -2j * np.pi * k * np.arange(taps.size)[None, :] / m.n_fft)
        ).sum(-1)
        ni, nq = awgn(jax.random.PRNGKey(20), ci, cq, 12.0)
        hr = m.estimate_channel(ni[..., off:off + nl],
                                nq[..., off:off + nl], denoise=False)
        hd = m.estimate_channel(ni[..., off:off + nl],
                                nq[..., off:off + nl], denoise=True)

        def mse(h):
            e = (np.asarray(h[0]) + 1j * np.asarray(h[1])) - h_true
            return float(np.mean(np.abs(e) ** 2))

        assert mse(hd) < 0.45 * mse(hr)
        # and decisions can only improve
        raw = _modem("qam16", channel_denoise=False)
        errs_raw = int(jnp.sum(raw.rx_frame(ni, nq, N_SYM) != bits))
        errs_den = int(jnp.sum(m.rx_frame(ni, nq, N_SYM) != bits))
        assert errs_den <= errs_raw

    def test_sfo_tracking_corrects_clock_drift(self):
        """60 ppm sampling-clock drift (a growing fractional delay,
        emulated with a per-sample Farrow mu) rotates the outer bins by
        ~0.5 rad by the frame's end. The slope-fitting pilot tracker
        recovers exact bits; the plain CPE tracker (no slope term)
        demonstrably cannot. (Higher drift also excites the Farrow
        emulator's own amplitude ripple on the outer bins — an artifact
        of the test channel, so the operating point stays at 60 ppm.)"""
        from modem_tpu.ops.impairments import farrow_delay

        n_sym = 40
        bits = None
        results = {}
        for mode in ("sfo", "cpe"):
            m = _modem("qam16", pilot_tracking=mode)
            if bits is None:
                bits = _bits(m, n_symbols=n_sym, seed=17)
            i, q = m.tx_frame(bits)
            delta = 6e-5
            mu = delta * jnp.arange(i.shape[-1], dtype=jnp.float32)
            ci = farrow_delay(i, mu)
            cq = farrow_delay(q, mu)
            out = m.rx_frame(ci, cq, n_sym)
            results[mode] = int(jnp.sum(out != bits))
        assert results["sfo"] == 0
        assert results["cpe"] > 0

    def test_sfo_validation(self):
        with pytest.raises(ValueError):
            _modem(pilot_tracking="nonsense")
        with pytest.raises(ValueError):
            OfdmModem(make_scheme("qpsk", RATES),
                      data_bins=tuple(range(1, 20)), pilot_bins=(20,),
                      pilot_tracking="sfo")  # needs >= 2 pilots

    def test_llr_signs_match_hard_decisions_and_fade_weighting(self):
        m = _modem("qam16")
        bits = _bits(m)
        i, q = m.tx_frame(bits)
        ci, cq = multipath_fir(i, q, CH_FADED_I, CH_FADED_Q)
        ci, cq = awgn(jax.random.PRNGKey(3), ci, cq, 28.0)
        off = m.preamble_len
        h = m.estimate_channel(ci[..., m.sym_len:off], cq[..., m.sym_len:off])
        llr = m.rx_soft_payload(ci[..., off:], cq[..., off:], N_SYM, h,
                                noise_var=1e-3)
        hard = m.rx_payload(ci[..., off:], cq[..., off:], N_SYM, h)
        assert llr.shape == bits.shape
        # soft and hard paths must agree bit-for-bit (errors and all)
        np.testing.assert_array_equal(
            np.asarray(llr_hard_bits(llr)), np.asarray(hard))
        # weighting: faded bins (small |H|^2) must yield weaker beliefs
        hi, hq = h
        m2 = np.asarray(hi * hi + hq * hq)[..., np.asarray(
            m._data_in_used)]
        mag = np.abs(np.asarray(llr)).reshape(
            bits.shape[0], N_SYM, m.n_data, m.bits_per_symbol).mean((0, 1, 3))
        weak, strong = np.argmin(m2[0]), np.argmax(m2[0])
        assert mag[weak] < mag[strong]

    def test_deep_fade_coded_llrs_beat_hard_decisions(self):
        """The payoff of channel-weighted soft output: over a channel with
        a -21 dB spectral null, hard OFDM decisions have a persistent error
        floor, but the K=7 code over the |H|^2-weighted LLRs decodes
        exactly — faded bins contribute proportionally weak beliefs and
        the trellis bridges them."""
        from modem_tpu.fec import block_deinterleave, block_interleave, \
            ccsds_code

        m = _modem()  # QPSK on 48 bins: 96 coded bits/symbol
        code = ccsds_code()
        n_sym, snr = 12, 17.0
        k = m.bits_per_frame(n_sym) // 2 - (code.k - 1)  # 570
        rng = np.random.default_rng(9)
        data = jnp.asarray(rng.integers(0, 2, (4, k)), jnp.int32)
        cbits = block_interleave(code.encode(data), rows=16)
        i, q = m.tx_frame(cbits)
        ci, cq = multipath_fir(i, q, CH_FADED_I, CH_FADED_Q)
        ci, cq = awgn(jax.random.PRNGKey(11), ci, cq, snr)
        p = float(jnp.mean(i * i + q * q))
        nv = p / (2.0 * 10.0 ** (snr / 10.0))
        off = m.preamble_len
        h = m.estimate_channel(ci[..., m.sym_len:off],
                               cq[..., m.sym_len:off])
        hard = m.rx_payload(ci[..., off:], cq[..., off:], n_sym, h)
        llr = m.rx_soft_payload(ci[..., off:], cq[..., off:], n_sym, h,
                                noise_var=nv)
        dec = code.decode_soft(block_deinterleave(llr, rows=16))
        uncoded = int(jnp.sum(hard != cbits))
        coded = int(jnp.sum(dec != data))
        assert uncoded > 20  # the fade genuinely bites
        assert coded == 0


class TestFramedLinkOverOfdm:
    def test_ldpc_framed_link_over_faded_ofdm(self):
        """The full production arrangement over the multicarrier PHY:
        FramedLink (CRC + scramble + QC-LDPC + interleave) with OfdmChain
        as the modem, through the deep-fade channel — exact payloads and
        true CRC verdicts where hard decisions fail."""
        from modem_tpu.fec import QcLdpc
        from modem_tpu.link import FramedLink
        from modem_tpu.ofdm import OfdmChain

        code = QcLdpc()
        m = _modem()  # 96 coded bits per OFDM symbol
        # 8 LDPC codewords -> 5184 wire bits = 54 OFDM symbols exactly
        link = FramedLink(OfdmChain(m), payload_bits=8 * code.k - 16,
                          ldpc=code, ldpc_iters=40)
        assert link.n_symbols == 54
        rng = np.random.default_rng(13)
        payload = jnp.asarray(
            rng.integers(0, 2, (3, link.payload_bits)), jnp.int32)
        i, q = link.tx(payload)
        ci, cq = multipath_fir(i, q, CH_FADED_I, CH_FADED_Q)
        snr = 16.0
        p = float(jnp.mean(i * i + q * q))
        ci, cq = awgn(jax.random.PRNGKey(14), ci, cq, snr, signal_power=p)
        nv = p / (2.0 * 10.0 ** (snr / 10.0))
        out, ok = link.rx((ci, cq), nv)
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))


class TestBerTheory:
    @pytest.mark.parametrize("es_n0_db", [6.0, 8.0])
    def test_ofdm_qpsk_matches_closed_form(self, es_n0_db):
        """Unitary grid -> per-bin Es/N0 == per-sample Es/N0, so OFDM
        QPSK over AWGN must reproduce the single-carrier closed form."""
        from modem_tpu.harness import ofdm_ber_point, qpsk_ber_theory

        pt = ofdm_ber_point(make_scheme("qpsk", RATES), es_n0_db,
                            seed=int(es_n0_db))
        theory = qpsk_ber_theory(es_n0_db)
        assert pt.bit_errors > 300  # enough statistics
        assert 0.9 < pt.ber / theory < 1.12


class TestWidebandComposition:
    def test_ofdm_bank_through_the_channelizer(self):
        """One wideband antenna, M OFDM channels: synthesize 8 frames
        into one wideband stream, analyze back, blind-acquire each —
        exact bits. The banks' per-channel response (a ~2*J-sample
        dispersion well inside the frame's CP budget at the default
        taps_per_phase=12) is absorbed by the LS channel estimate; the
        group delay by the acquisition. (A deliberately sloppy 6-tap
        bank leaks edge-bin errors — the transition band clipping the
        outermost subcarriers — which is why the default stays 12.)"""
        from modem_tpu import Channelizer

        m = _modem()
        bank = Channelizer(8, taps_per_phase=12)
        n_sym = 8
        bits = _bits(m, channels=8, n_symbols=n_sym, seed=21)
        i, q = m.tx_frame(bits)
        pad = jnp.zeros((8, 128 + 64), jnp.float32)
        ci = jnp.concatenate([i, pad], -1)
        cq = jnp.concatenate([q, pad], -1)
        n = ci.shape[-1] - ci.shape[-1] % 8
        wi, wq = bank.synthesize(ci[..., :n], cq[..., :n])
        ni, nq = awgn(jax.random.PRNGKey(22), wi, wq, 35.0)
        ri, rq = bank.analyze(ni, nq)
        out, rep = m.acquire(ri, rq, n_sym, max_lag=128)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))
        # all channels locate the same bank group delay
        assert len(set(np.asarray(rep["start"]).tolist())) == 1


class TestAcquire:
    def _impair(self, i, q, offset, cfo_bins, seed=5, snr=25.0):
        m_gap = jnp.zeros(i.shape[:-1] + (offset,), i.dtype)
        ci = jnp.concatenate([m_gap, i], axis=-1)
        cq = jnp.concatenate([m_gap, q], axis=-1)
        ci, cq = multipath_fir(ci, cq, CH_MILD_I, CH_MILD_Q)
        ci, cq = apply_cfo(ci, cq, cfo_hz=cfo_bins / 64.0, sample_rate=1)
        ci, cq = apply_gain_phase(ci, cq, gain=1.4, phase=-2.0)
        return awgn(jax.random.PRNGKey(seed), ci, cq, snr)

    def test_blind_acquire_full_stack(self):
        m = _modem()
        bits = _bits(m, channels=3)
        i, q = m.tx_frame(bits)
        ci, cq = self._impair(i, q, offset=37, cfo_bins=1.3)
        out, rep = m.acquire(ci, cq, N_SYM, max_lag=128)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))
        # located start = inserted gap + channel's dominant-path delay
        assert np.all(np.abs(np.asarray(rep["start"]) - 37) <= 4)
        # CFO estimate within a few percent of a subcarrier
        cfo_true = 1.3 * 2 * np.pi / 64.0
        assert np.all(
            np.abs(np.asarray(rep["cfo_rad_per_sample"]) - cfo_true)
            < 0.03 * 2 * np.pi / 64.0)

    def test_acquire_soft_agrees_with_hard(self):
        m = _modem()
        bits = _bits(m, channels=2, seed=33)
        i, q = m.tx_frame(bits)
        ci, cq = self._impair(i, q, offset=25, cfo_bins=0.5)
        hard, _ = m.acquire(ci, cq, N_SYM, max_lag=64)
        llr, rep = m.acquire_soft(ci, cq, N_SYM, max_lag=64,
                                  noise_var=1e-2)
        assert llr.shape == bits.shape
        np.testing.assert_array_equal(
            np.asarray(llr_hard_bits(llr)), np.asarray(hard))
        assert np.all(np.abs(np.asarray(rep["start"]) - 25) <= 4)

    def test_fir_correlator_matches_gather(self):
        """The FIR fine-timing correlator (default, gather-rule form) and
        the materialized-window gather reference locate the same start and
        decode the same bits; the correlation surface agrees to f32
        rounding (different summation order)."""
        m = _modem()
        bits = _bits(m, channels=3, seed=21)
        i, q = m.tx_frame(bits)
        ci, cq = self._impair(i, q, offset=43, cfo_bins=0.9)
        fi_f, fq_f, rep_f = m.locate_frame(ci, cq, N_SYM, max_lag=128,
                                           correlator="fir")
        fi_g, fq_g, rep_g = m.locate_frame(ci, cq, N_SYM, max_lag=128,
                                           correlator="gather")
        np.testing.assert_array_equal(np.asarray(rep_f["start"]),
                                      np.asarray(rep_g["start"]))
        np.testing.assert_array_equal(np.asarray(fi_f), np.asarray(fi_g))
        out_f = m.rx_frame(fi_f, fq_f, N_SYM)
        np.testing.assert_array_equal(np.asarray(out_f), np.asarray(bits))
        cr_f, cj_f = m._preamble_correlate(ci, cq, 128, "fir")
        cr_g, cj_g = m._preamble_correlate(ci, cq, 128, "gather")
        np.testing.assert_allclose(np.asarray(cr_f), np.asarray(cr_g),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(cj_f), np.asarray(cj_g),
                                   rtol=2e-4, atol=2e-3)

    def test_matmul_aligner_matches_gather(self):
        """The one-hot matmul frame aligner (default; the take_along_axis
        gather was ~82% of the acquire pass on hardware, BENCH.md) is
        EXACTLY the gather it replaces — same start, same frame samples,
        same bits."""
        m = _modem()
        bits = _bits(m, channels=3, seed=33)
        i, q = m.tx_frame(bits)
        ci, cq = self._impair(i, q, offset=61, cfo_bins=-0.7)
        fi_m, fq_m, rep_m = m.locate_frame(ci, cq, N_SYM, max_lag=128,
                                           aligner="matmul")
        fi_g, fq_g, rep_g = m.locate_frame(ci, cq, N_SYM, max_lag=128,
                                           aligner="gather")
        np.testing.assert_array_equal(np.asarray(rep_m["start"]),
                                      np.asarray(rep_g["start"]))
        np.testing.assert_array_equal(np.asarray(fi_m), np.asarray(fi_g))
        np.testing.assert_array_equal(np.asarray(fq_m), np.asarray(fq_g))
        out = m.rx_frame(fi_m, fq_m, N_SYM)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_acquire_pads_short_capture(self):
        m = _modem()
        bits = _bits(m, channels=1)
        i, q = m.tx_frame(bits)
        out, _ = m.acquire(i, q, N_SYM, max_lag=64)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))

    def test_sharded_ofdm_matches_single_device(self):
        """8 channels sharded over an 8-device "ch" mesh: TX waveform and
        blind-acquired decisions bitwise-equal to the single-device path
        (pure shard_map, zero collectives)."""
        from modem_tpu.parallel import (
            make_modem_mesh, sharded_ofdm_rx_fn, sharded_ofdm_tx_fn,
        )

        m = _modem()
        mesh = make_modem_mesh(ch=8)
        bits = _bits(m, channels=8, seed=12)
        ref_i, ref_q = m.tx_frame(bits)
        tx = sharded_ofdm_tx_fn(m, mesh)
        si, sq = tx(bits)
        np.testing.assert_array_equal(np.asarray(si), np.asarray(ref_i))
        np.testing.assert_array_equal(np.asarray(sq), np.asarray(ref_q))
        ci, cq = self._impair(ref_i, ref_q, offset=21, cfo_bins=0.7)
        ref_bits, _ = m.acquire(ci, cq, N_SYM, max_lag=64)
        rx = sharded_ofdm_rx_fn(m, mesh, N_SYM, max_lag=64)
        np.testing.assert_array_equal(
            np.asarray(rx(ci, cq)), np.asarray(ref_bits))
        np.testing.assert_array_equal(np.asarray(ref_bits),
                                      np.asarray(bits))

    def test_sc_metric_peaks_on_stf(self):
        m = _modem()
        bits = _bits(m, channels=1)
        i, q = m.tx_frame(bits)
        gap = 50
        zi = jnp.concatenate(
            [jnp.zeros(i.shape[:-1] + (gap,), i.dtype), i], axis=-1)
        zq = jnp.concatenate(
            [jnp.zeros(q.shape[:-1] + (gap,), q.dtype), q], axis=-1)
        metric, _, _ = m.sc_metric(zi, zq, 200)
        peak = int(np.argmax(np.asarray(metric)[0]))
        # periodic region: anywhere in the STF symbol
        assert gap - 2 <= peak <= gap + m.sym_len

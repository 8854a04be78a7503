"""FramedLink (modem_tpu/link.py): the composed production link.

End-to-end payload→waveform→payload with CRC verdicts, across the stage
combinations (with/without RS outer code, with/without puncturing), plus
the size-coupling validation errors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modem_tpu import Rates, qpsk_reference_chain
from modem_tpu.fec import Puncturer, ccsds_code, rate34_pattern, rs_dvb
from modem_tpu.link import FramedLink
from modem_tpu.ops.channel import awgn


RATES = Rates(baud_rate=1250, sample_rate=10000)


def _run(link, snr_db, channels=4, seed=0):
    rng = np.random.default_rng(seed)
    payload = jnp.asarray(
        rng.integers(0, 2, (channels, link.payload_bits)), jnp.int32)
    i, q = link.tx(payload)
    ni, nq = awgn(jax.random.key(seed), i, q, snr_db=snr_db)
    p = float(jnp.mean(i * i + q * q))
    nv = p / (2.0 * 10.0 ** (snr_db / 10.0))
    out, ok = link.rx((ni, nq), nv)
    errs = int(jnp.sum(out != payload))
    return errs, np.asarray(ok), payload.size


class TestFramedLink:
    def test_plain_conv_link_clean_at_low_snr(self):
        link = FramedLink(qpsk_reference_chain(RATES), payload_bits=1002)
        assert link.wire_bits == 2048 and link.n_symbols == 1024
        errs, ok, n = _run(link, snr_db=-4.0)
        assert errs == 0 and ok.all()

    def test_crc_flags_a_broken_channel(self):
        link = FramedLink(qpsk_reference_chain(RATES), payload_bits=1002)
        errs, ok, n = _run(link, snr_db=-11.0, seed=1)
        assert errs > 0
        assert not ok.any()

    def test_concatenated_rs_link(self):
        # DVB RS(204,188) outer: steps = 204*8+6 = 1638; rows must divide
        # wire 3276 -> rows=4.
        link = FramedLink(qpsk_reference_chain(RATES), rs=rs_dvb(),
                          interleave_rows=4)
        assert link.payload_bits == 188 * 8 - 16
        # At an SNR where the inner decoder leaks errors, the outer code
        # must deliver exact frames.
        errs, ok, n = _run(link, snr_db=-6.5, seed=2)
        assert errs == 0 and ok.all()

    def test_punctured_rs_link(self):
        # rate-3/4 inner: steps 1638 divides by 3; wire 4368/8 ok.
        link = FramedLink(qpsk_reference_chain(RATES), rs=rs_dvb(),
                          puncturer=Puncturer(rate34_pattern()),
                          interleave_rows=8)
        assert link.wire_bits == 1638 // 3 * 4  # 4 kept of 6 per period
        errs, ok, n = _run(link, snr_db=-2.0, seed=3)
        assert errs == 0 and ok.all()

    def test_ldpc_inner_link(self):
        """QC-LDPC as the inner code: exact payload + ok verdicts at an
        SNR where the uncoded chain has a clear error floor (rate 1/2,
        two codewords per frame)."""
        from modem_tpu.fec import QcLdpc

        code = QcLdpc()
        link = FramedLink(qpsk_reference_chain(RATES),
                          payload_bits=2 * code.k - 16, ldpc=code,
                          ldpc_iters=40)
        assert link.wire_bits == 2 * code.n
        errs, ok, n = _run(link, snr_db=-3.0, seed=5)
        assert errs == 0 and ok.all()

    def test_ldpc_validation(self):
        from modem_tpu.fec import QcLdpc

        code = QcLdpc()
        chain = qpsk_reference_chain(RATES)
        with pytest.raises(ValueError):
            FramedLink(chain, payload_bits=100, ldpc=code)  # not a block
        with pytest.raises(ValueError):
            FramedLink(chain, payload_bits=code.k - 16, ldpc=code,
                       conv=ccsds_code())  # two inner codes
        with pytest.raises(ValueError):
            FramedLink(chain, payload_bits=code.k - 16, ldpc=code,
                       puncturer=Puncturer(rate34_pattern()))

    def test_size_validation(self):
        chain = qpsk_reference_chain(RATES)
        try:
            FramedLink(chain)  # no payload size, no RS
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
        try:
            FramedLink(chain, rs=rs_dvb(), interleave_rows=8)  # 3276 % 8
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "interleave_rows" in str(e)
        try:
            FramedLink(chain, rs=rs_dvb(), payload_bits=100)
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "RS" in str(e)

    def test_whole_path_jits(self):
        link = FramedLink(qpsk_reference_chain(RATES), payload_bits=1002)
        rng = np.random.default_rng(4)
        payload = jnp.asarray(
            rng.integers(0, 2, (2, link.payload_bits)), jnp.int32)

        @jax.jit
        def loop(p):
            i, q = link.tx(p)
            return link.rx((i, q), 1e-4)

        out, ok = loop(payload)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))
        assert np.asarray(ok).all()


@pytest.mark.slow
class TestSizeSolverFuzz:
    def test_random_payload_sizes_construct_or_raise_cleanly(self):
        """Any payload size either builds a consistent link (validated by
        a noiseless exact roundtrip) or raises an actionable ValueError —
        never a shape crash deeper in the stack."""
        chain = qpsk_reference_chain(RATES)
        rng = np.random.default_rng(0)
        built = 0
        for p in rng.integers(50, 3000, size=40):
            try:
                link = FramedLink(chain, payload_bits=int(p))
            except ValueError:
                continue
            built += 1
            payload = jnp.asarray(
                rng.integers(0, 2, (1, link.payload_bits)), jnp.int32)
            i, q = link.tx(payload)
            out, ok = link.rx((i, q), 1e-4)
            assert bool(np.asarray(ok).all())
            np.testing.assert_array_equal(np.asarray(out),
                                          np.asarray(payload))
        assert built >= 5  # the solver accepts a healthy fraction


class TestPolarInner:
    def test_polar_framed_link(self):
        """Polar inner code in the framed link: exact payloads + true CRC
        verdicts at an SNR where the raw channel is demonstrably noisy."""
        from modem_tpu.fec import PolarCode

        code = PolarCode(256, 128)
        link = FramedLink(qpsk_reference_chain(RATES),
                          payload_bits=4 * code.k - 16, polar=code)
        assert link.wire_bits == 4 * code.n
        errs, ok, n = _run(link, snr_db=-2.0, seed=7)
        assert errs == 0 and ok.all()

    def test_rate_matched_polar_framed_link(self):
        """RateMatchedPolar as the inner code: E (not N) bits per
        codeword on the wire, exact payloads + true CRC verdicts."""
        from modem_tpu.fec import RateMatchedPolar

        code = RateMatchedPolar(128, 192, n=256)      # shorten, r=2/3
        assert code.mode == "shorten"
        link = FramedLink(qpsk_reference_chain(RATES),
                          payload_bits=4 * code.k - 16, polar=code)
        assert link.wire_bits == 4 * code.e
        errs, ok, n = _run(link, snr_db=3.0, seed=8)
        assert errs == 0 and ok.all()

    def test_polar_list_inner_decode(self):
        """polar_list routes the inner decode through metric-best SCL;
        at operating SNR decisions match SC and verdicts hold (SCL can
        only improve on SC), and the option is polar-only."""
        from modem_tpu.fec import PolarCode

        code = PolarCode(128, 64)
        chain = qpsk_reference_chain(RATES)
        kw = dict(payload_bits=4 * code.k - 16, polar=code)
        sc = FramedLink(chain, **kw)
        scl = FramedLink(chain, **kw, polar_list=8)
        errs, ok, n = _run(scl, snr_db=0.0, seed=11)
        assert errs == 0 and ok.all()
        errs_sc, ok_sc, _ = _run(sc, snr_db=0.0, seed=11)
        assert errs_sc == 0 and ok_sc.all()
        with pytest.raises(ValueError, match="polar_list"):
            FramedLink(chain, payload_bits=1002, polar_list=8)

    def test_polar_excludes_other_inners(self):
        from modem_tpu.fec import PolarCode, QcLdpc

        chain = qpsk_reference_chain(RATES)
        with pytest.raises(ValueError):
            FramedLink(chain, payload_bits=100, polar=PolarCode(64, 32),
                       ldpc=QcLdpc())
        with pytest.raises(ValueError):
            FramedLink(chain, payload_bits=100, polar=PolarCode(64, 32),
                       puncturer=Puncturer(rate34_pattern()))
        with pytest.raises(ValueError):  # size coupling
            FramedLink(chain, payload_bits=100, polar=PolarCode(64, 32))


class TestConvWindow:
    def test_windowed_inner_decode_matches_full_block(self):
        """conv_window routes the inner decode through the windowed
        (fused-on-TPU) form; at operating SNR decisions match the
        full-block ML decode and the CRC verdicts hold."""
        from modem_tpu import Rates
        from modem_tpu.chain import qpsk_reference_chain
        from modem_tpu.ops.channel import awgn
        chain = qpsk_reference_chain(Rates(1250, 10000))
        full = FramedLink(chain, payload_bits=1002)
        win = FramedLink(chain, payload_bits=1002, conv_window=256)
        rng = np.random.default_rng(9)
        payload = jnp.asarray(rng.integers(0, 2, (4, 1002)), jnp.int32)
        i, q = full.tx(payload)
        ci, cq = awgn(jax.random.key(3), i, q, 2.0)
        nv = 10 ** (-2 / 10)
        pa, oka = full.rx((ci, cq), noise_var=nv)
        pb, okb = win.rx((ci, cq), noise_var=nv)
        assert bool(np.asarray(oka).all()) and bool(np.asarray(okb).all())
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(payload))
        np.testing.assert_array_equal(np.asarray(pb), np.asarray(payload))


class TestFusedLinkPath:
    """Round-5: FramedLink.tx_fused/rx_fused (the CLI's production route)."""

    def test_cpu_fallback_is_staged(self):
        from modem_tpu.presets import reference_link
        lk = reference_link()
        rng = np.random.default_rng(11)
        p = jnp.asarray(rng.integers(0, 2, (2, lk.payload_bits)), jnp.int32)
        si, sq = lk.tx(p)
        fi, fq = lk.tx_fused(p)  # CPU backend -> identical staged path
        np.testing.assert_array_equal(np.asarray(si), np.asarray(fi))
        np.testing.assert_array_equal(np.asarray(sq), np.asarray(fq))

    def test_forced_fused_route_decodes_identically(self):
        """Force the fused route (interpret-mode kernels on CPU): the
        decoded payloads and CRC verdicts match the staged RX."""
        from modem_tpu.presets import reference_link
        lk = reference_link()
        lk._fused_ok = lambda: True
        rng = np.random.default_rng(12)
        p = jnp.asarray(rng.integers(0, 2, (2, lk.payload_bits)), jnp.int32)
        i, q = lk.tx_fused(p)
        key = jax.random.key(3)
        from modem_tpu.ops.channel import awgn
        ci, cq = awgn(key, i, q, 4.0)
        nv = 10.0 ** -0.4
        got_f, ok_f = lk.rx_fused((ci, cq), noise_var=nv)
        got_s, ok_s = lk.rx((ci, cq), noise_var=nv)
        np.testing.assert_array_equal(np.asarray(got_f), np.asarray(got_s))
        np.testing.assert_array_equal(np.asarray(ok_f), np.asarray(ok_s))
        assert bool(np.asarray(ok_f).all())
        np.testing.assert_array_equal(np.asarray(got_f), np.asarray(p))

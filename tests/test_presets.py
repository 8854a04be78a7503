"""Preset link configurations roundtrip at their documented operating
points (modem_tpu/presets.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from modem_tpu import presets
from modem_tpu.ops.channel import awgn


def _run_link(link, snr_db, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    payload = jnp.asarray(
        rng.integers(0, 2, (channels, link.payload_bits)), jnp.int32)
    i, q = link.tx(payload)
    p = float(jnp.mean(i * i + q * q))
    ni, nq = awgn(jax.random.key(seed), i, q, snr_db, signal_power=p)
    nv = p / (2.0 * 10.0 ** (snr_db / 10.0))
    out, ok = link.rx((ni, nq), nv)
    return int(jnp.sum(out != payload)), np.asarray(ok)


def test_reference_link():
    errs, ok = _run_link(presets.reference_link(), snr_db=-4.0)
    assert errs == 0 and ok.all()


def test_wifi_like_ofdm_link():
    link = presets.wifi_like_ofdm_link()
    assert link.n_symbols == 54
    errs, ok = _run_link(link, snr_db=8.0)
    assert errs == 0 and ok.all()


def test_dvb_like_link():
    errs, ok = _run_link(presets.dvb_like_link(), snr_db=3.0, seed=1)
    assert errs == 0 and ok.all()


def test_ccsds_deep_space_link():
    errs, ok = _run_link(presets.ccsds_deep_space_link(), snr_db=0.0,
                         seed=2)
    assert errs == 0 and ok.all()


def test_lte_like_turbo_link():
    link = presets.lte_like_turbo_link()
    assert link.payload_bits == 1008 and link.n_symbols == 1542
    errs, ok = _run_link(link, snr_db=-6.0, seed=6)
    assert errs == 0 and ok.all()


def test_nr_like_control_link():
    link = presets.nr_like_control_link()
    assert link.payload_bits == 384 and link.n_symbols == 360
    errs, ok = _run_link(link, snr_db=1.0, seed=3)
    assert errs == 0 and ok.all()


def test_mimo_ofdm_link():
    """Rate-doubled MIMO counterpart of the wifi link: same airtime per
    slot, 26 LDPC codewords through a cross-coupled flat 2x2 channel."""
    from modem_tpu.ops.impairments import apply_gain_phase

    link = presets.mimo_ofdm_link()
    assert link.n_symbols == 81
    rng = np.random.default_rng(7)
    payload = jnp.asarray(
        rng.integers(0, 2, (2, link.payload_bits)), jnp.int32)
    (ia, qa), (ib, qb) = link.tx(payload)
    outs = []
    for r, (ga, pa, gb, pb) in enumerate(
            [(1.0, 0.3, 0.6, -1.2), (0.5, 2.0, 0.9, 0.8)]):
        xi, xq = apply_gain_phase(ia, qa, gain=ga, phase=pa)
        yi, yq = apply_gain_phase(ib, qb, gain=gb, phase=pb)
        ci, cq = xi + yi, xq + yq
        p = float(jnp.mean(ci * ci + cq * cq))
        ci, cq = awgn(jax.random.fold_in(jax.random.key(8), r),
                      ci, cq, 12.0, signal_power=p)
        outs += [ci, cq]
    p = float(jnp.mean(outs[0] ** 2 + outs[1] ** 2))
    nv = p / 10.0 ** 1.2
    out, ok = link.rx(tuple(outs), noise_var=nv)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))


def test_gsm_like_gmsk():
    chain = presets.gsm_like_gmsk()
    rng = np.random.default_rng(3)
    bits = jnp.asarray(rng.integers(0, 2, (2, 128)), jnp.int32)
    np.testing.assert_array_equal(np.asarray(chain.roundtrip(bits)),
                                  np.asarray(bits))


def test_qam16_gray_chain():
    chain = presets.qam16_gray_chain()
    rng = np.random.default_rng(4)
    bits = jnp.asarray(rng.integers(0, 2, 128 * 4), jnp.int32)
    np.testing.assert_array_equal(np.asarray(chain.roundtrip(bits)),
                                  np.asarray(bits))


def test_burst_receiver_decodes_wifi_link_frame():
    """Composition: a wifi_like_ofdm_link frame dropped into a noisy
    stream at an unknown offset is found by burst_ofdm_receiver and
    decodes to the exact payload with a true CRC verdict."""
    link = presets.wifi_like_ofdm_link()
    rxr = presets.burst_ofdm_receiver(n_symbols=link.n_symbols)
    rng = np.random.default_rng(5)
    payload = jnp.asarray(
        rng.integers(0, 2, link.payload_bits), jnp.int32)
    i, q = link.tx(payload)
    amp = 10.0 ** (-30.0 / 20.0)
    gap = 137
    si = np.concatenate([amp * rng.standard_normal(gap),
                         np.asarray(i),
                         amp * rng.standard_normal(80)]).astype(np.float32)
    sq = np.concatenate([amp * rng.standard_normal(gap),
                         np.asarray(q),
                         amp * rng.standard_normal(80)]).astype(np.float32)
    si += amp * rng.standard_normal(si.size).astype(np.float32)
    sq += amp * rng.standard_normal(sq.size).astype(np.float32)
    frames = rxr.push(jnp.asarray(si), jnp.asarray(sq)) + rxr.flush()
    assert len(frames) == 1
    # frames[0][0] is rx_frame's hard bits; decode the payload through
    # the LINK instead: re-slice the located frame from the stream
    start = frames[0][1]["start"]
    flen = rxr.frame_len
    ci = jnp.asarray(si[start:start + flen])
    cq = jnp.asarray(sq[start:start + flen])
    out, ok = link.rx((ci, cq), noise_var=amp ** 2 * 2)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(payload))

"""Byte-format IO (native C++ + NumPy fallback) and the CLI binaries."""

import io as _stdio

import numpy as np
import pytest

import jax.numpy as jnp

from modem_tpu import io as mio
from modem_tpu.cli import demodulate as cli_demod
from modem_tpu.cli import modulate as cli_mod
from modem_tpu.config import Rates
from modem_tpu.models import make_scheme
from modem_tpu.ops.pll import LOCK_SAMPLES
from modem_tpu.rx import Demodulator
from modem_tpu.tx import Modulator


class TestByteFormats:
    def test_parse_ascii_bits(self):
        bits = mio.parse_ascii_bits(b"01 10\n\t11\r0")
        np.testing.assert_array_equal(bits, [0, 1, 1, 0, 1, 1, 0])

    def test_parse_rejects_garbage(self):
        with pytest.raises(ValueError):
            mio.parse_ascii_bits(b"0102")

    def test_parse_latin1_whitespace(self):
        """Rust's `(byte as char).is_whitespace()` also accepts NEL/NBSP
        (`data.rs:151`); both the native and NumPy parsers must too."""
        bits = mio.parse_ascii_bits(b"0\x851\xa00")
        np.testing.assert_array_equal(bits, [0, 1, 0])

    def test_ascii_roundtrip(self):
        bits = np.asarray([1, 0, 1, 1, 0], np.uint8)
        assert mio.parse_ascii_bits(mio.format_ascii_bits(bits)).tolist() \
            == bits.tolist()

    def test_native_matches_fallback(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=257).astype(np.float32)
        lib = mio._native()
        if lib is None:
            pytest.skip("native toolchain unavailable")
        data = mio.f32_to_f32le(x)
        assert data == x.astype("<f4").tobytes()
        np.testing.assert_array_equal(mio.f32le_to_f32(data), x)
        words = rng.integers(-32768, 32768, 100).astype("<i2")
        np.testing.assert_array_equal(
            mio.i16le_to_f32(words.tobytes()), words.astype(np.float32)
        )

    def test_interleave(self):
        out = mio.interleave_iq(np.asarray([1.0, 2.0]), np.asarray([3.0, 4.0]))
        np.testing.assert_array_equal(out, [1.0, 3.0, 2.0, 4.0])

    def test_iq_text(self):
        txt = mio.format_iq_text(np.asarray([1.5]), np.asarray([-2.0]))
        assert txt == b"i:1.5\tq:-2\n"

    def test_i16_drops_odd_trailing_byte(self):
        assert mio.i16le_to_f32(b"\x01\x00\xff").tolist() == [1.0]


def _run_modulate(argv, stdin: bytes) -> bytes:
    args = cli_mod.build_parser().parse_args(argv)
    out = _stdio.BytesIO()
    cli_mod.run(args, stdin, out)
    return out.getvalue()


class TestModulateCli:
    def test_iq_matches_library(self):
        raw = _run_modulate(["-m", "qpsk", "-r", "10000", "-b", "1250", "--iq"],
                            b"0111001010110100")
        rates = Rates(1250, 10000)
        mod = Modulator(make_scheme("qpsk", rates), rates)
        bits = jnp.asarray([0, 1, 1, 1, 0, 0, 1, 0, 1, 0, 1, 1, 0, 1, 0, 0],
                           jnp.int32)
        (i, q), _ = mod.baseband(bits, mod.init_state())
        expect = mio.interleave_iq(np.asarray(i), np.asarray(q))
        np.testing.assert_array_equal(mio.f32le_to_f32(raw), expect)

    def test_passband_with_preamble_length(self):
        # sr/cf * pc - 1 preamble samples + n_sym*sps digital samples
        raw = _run_modulate(
            ["-m", "bpsk", "-r", "10000", "-b", "1250", "-c", "1000", "-p", "2"],
            b"0101",
        )
        samples = mio.f32le_to_f32(raw)
        assert samples.size == (10000 // 1000 * 2 - 1) + 4 * 8

    def test_trailing_partial_symbol_dropped(self):
        raw = _run_modulate(["-m", "qpsk", "-r", "8000", "-b", "1000", "--iq"],
                            b"011")  # 1.5 QPSK symbols -> 1 symbol
        assert mio.f32le_to_f32(raw).size == 2 * 8

    def test_nyquist_assert(self):
        with pytest.raises(SystemExit):
            _run_modulate(["-m", "bpsk", "-r", "1000", "-b", "100",
                           "-c", "600"], b"01")

    def test_preamble_divisibility_assert(self):
        with pytest.raises(SystemExit):
            _run_modulate(["-m", "bpsk", "-r", "10000", "-b", "220",
                           "-c", "900", "-p", "1"], b"01")

    def test_streaming_blocks_bitstable(self):
        """Block size must not change the waveform (state carry exactness)."""
        bits = b"01" * 64
        a = _run_modulate(["-m", "mfsk", "-r", "10000", "-b", "1250", "--iq"],
                          bits)
        b = _run_modulate(["-m", "mfsk", "-r", "10000", "-b", "1250", "--iq",
                           "--block-symbols", "7"], bits)
        np.testing.assert_array_equal(mio.f32le_to_f32(a), mio.f32le_to_f32(b))


class TestDemodulateCli:
    def _passband_bytes(self, n_sym=32):
        rates = Rates(1250, 10000)
        mod = Modulator(make_scheme("bpsk", rates), rates, carrier_hz=900)
        rng = np.random.default_rng(5)
        bits = jnp.asarray(rng.integers(0, 2, n_sym), jnp.int32)
        wave, _ = mod.passband(bits, mod.init_state())
        x = np.clip(np.asarray(wave) * 8000.0, -32768, 32767).astype("<i2")
        return x.tobytes(), x.astype(np.float32)

    def test_matches_library_demodulator(self):
        data, x = self._passband_bytes()
        args = cli_demod.build_parser().parse_args([])
        out = _stdio.BytesIO()
        cli_demod.run(args, data, out)
        lines = out.getvalue().decode().strip().split("\n")
        assert len(lines) == x.size - LOCK_SAMPLES

        demod = Demodulator(900, 10000)
        st = demod.lock_phase(jnp.asarray(x[:LOCK_SAMPLES]), demod.init_state())
        (i, q), _ = demod.demodulate(jnp.asarray(x[LOCK_SAMPLES:]), st)
        first_i = float(i[0])
        got_i = float(lines[0].split("\t")[0][2:])
        assert abs(got_i - first_i) < 1e-3 * max(1.0, abs(first_i))

    def test_requires_lock_samples(self):
        args = cli_demod.build_parser().parse_args([])
        with pytest.raises(SystemExit):
            cli_demod.run(args, b"\x00\x00" * 10, _stdio.BytesIO())


class _TinyChunkReader(_stdio.BytesIO):
    """Stream returning at most ``n`` bytes per read: forces the CLIs through
    many chunk seams (constant-memory path) on small test data."""

    def __init__(self, data: bytes, n: int):
        super().__init__(data)
        self._n = n

    def read(self, size=-1):
        return super().read(self._n if size is None or size < 0
                            else min(size, self._n))


class TestStreamingClis:
    """The CLIs consume stdin in bounded chunks; output must be byte-identical
    to one-shot processing for any chunking (state carry across seams)."""

    def test_modulate_chunked_identical(self):
        bits = np.random.default_rng(0).integers(0, 2, 4096)
        data = "".join("01"[b] for b in bits).encode()
        argv = ["-m", "qpsk", "-r", "10000", "-b", "1250", "--iq",
                "--block-symbols", "128"]
        one = _run_modulate(argv, data)
        args = cli_mod.build_parser().parse_args(argv)
        out = _stdio.BytesIO()
        cli_mod.run(args, _TinyChunkReader(data, 997), out)
        assert out.getvalue() == one

    def test_modulate_chunked_passband_identical(self):
        bits = np.random.default_rng(1).integers(0, 2, 2048)
        data = " ".join("01"[b] for b in bits).encode()  # whitespace mixed in
        argv = ["-m", "mfsk", "-r", "10000", "-b", "1250", "-c", "1000",
                "--block-symbols", "64"]
        one = _run_modulate(argv, data)
        args = cli_mod.build_parser().parse_args(argv)
        out = _stdio.BytesIO()
        cli_mod.run(args, _TinyChunkReader(data, 313), out)
        assert out.getvalue() == one

    def test_demodulate_chunked_identical(self):
        rng = np.random.default_rng(2)
        data = (rng.integers(-2000, 2000, 5000)
                .astype("<i2").tobytes() + b"\x7f")  # odd trailing byte
        argv = ["-r", "10000", "-c", "900", "--block-samples", "512"]
        args = cli_demod.build_parser().parse_args(argv)
        one = _stdio.BytesIO()
        cli_demod.run(args, data, one)
        out = _stdio.BytesIO()
        # odd chunk size: i16 words straddle every chunk seam
        cli_demod.run(args, _TinyChunkReader(data, 1001), out)
        assert out.getvalue() == one.getvalue()

    def test_demodulate_short_stream_exits(self):
        args = cli_demod.build_parser().parse_args(["-r", "10000"])
        with pytest.raises(SystemExit):
            cli_demod.run(args, b"\x00\x00" * 10, _stdio.BytesIO())


def test_demodulate_fused_flag_matches_staged():
    """--fused runs the Pallas product detector; i/q text agrees with the
    staged path to print precision on a chunked stream."""
    import io as _stdio

    rng = np.random.default_rng(3)
    data = rng.integers(-2000, 2000, 4000).astype("<i2").tobytes()
    base = ["-r", "10000", "-c", "900", "--block-samples", "512"]
    staged = _stdio.BytesIO()
    cli_demod.run(cli_demod.build_parser().parse_args(base), data, staged)
    fused = _stdio.BytesIO()
    cli_demod.run(cli_demod.build_parser().parse_args(base + ["--fused"]),
                  data, fused)
    a = np.array([float(v.split(b":")[1]) for line in
                  staged.getvalue().splitlines() for v in line.split(b"\t")])
    b = np.array([float(v.split(b":")[1]) for line in
                  fused.getvalue().splitlines() for v in line.split(b"\t")])
    assert a.size == b.size > 0
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=2e-4)


class TestLinkCli:
    def test_tx_rx_roundtrip_with_verdicts(self):
        import io as _io
        from modem_tpu.cli import link as cli_link
        rng = np.random.default_rng(0)
        n_frames = 3
        args = cli_link.build_parser().parse_args(
            ["tx", "--preset", "reference", "--batch-frames", "2"])
        lk = cli_link.PRESETS["reference"]()
        bits = rng.integers(0, 2, n_frames * lk.payload_bits)
        ascii_bits = "".join(str(b) for b in bits).encode()
        out = _io.BytesIO()
        rc = cli_link.run(args, ascii_bits, out)
        assert rc == 0
        wave = out.getvalue()

        rx_args = cli_link.build_parser().parse_args(
            ["rx", "--preset", "reference", "--noise-var", "0.05",
             "--batch-frames", "2"])
        dec = _io.BytesIO()
        err = _io.StringIO()
        rc = cli_link.run(rx_args, wave, dec, stderr=err)
        assert rc == 0
        lines = dec.getvalue().decode().split()
        assert len(lines) == n_frames
        got = np.asarray([int(c) for c in "".join(lines)])
        np.testing.assert_array_equal(got, bits)
        assert err.getvalue().count("OK") == n_frames

    def test_rx_flags_corrupted_frame(self):
        import io as _io
        from modem_tpu.cli import link as cli_link
        rng = np.random.default_rng(1)
        lk = cli_link.PRESETS["reference"]()
        bits = rng.integers(0, 2, lk.payload_bits)
        out = _io.BytesIO()
        cli_link.run(cli_link.build_parser().parse_args(
            ["tx", "--preset", "reference"]),
            "".join(str(b) for b in bits).encode(), out)
        wave = np.frombuffer(out.getvalue(), "<f4").copy()
        wave[len(wave) // 3: 2 * len(wave) // 3] = 0.0  # burst erasure
        dec = _io.BytesIO()
        err = _io.StringIO()
        rc = cli_link.run(cli_link.build_parser().parse_args(
            ["rx", "--preset", "reference", "--noise-var", "0.05"]),
            wave.astype("<f4").tobytes(), dec, stderr=err)
        assert rc == 1
        assert "BAD" in err.getvalue()

"""``link``: the coded production link as a CLI — payload bits to
waveform and back, with per-frame CRC verdicts.

The reference's CLI surface stops at uncoded bits↔waveform
(`/root/reference/src/bin/modulate.rs`, `demodulate.rs`); this command
exposes the framework's production arrangement (CRC + scrambler + FEC +
interleaver + chain — :class:`modem_tpu.link.FramedLink`, constructed by
name from :mod:`modem_tpu.presets`) with the same IO conventions as the
reference-parity commands: ASCII ``0``/``1`` payload bits, little-endian
f32 interleaved (i, q) waveforms, block-streamed constant-memory
processing.

    link tx --preset reference < payload.bits > frames.f32
    link rx --preset reference --noise-var 0.05 < frames.f32 > out.bits

``rx`` prints one OK/BAD CRC verdict per frame on stderr and exits
non-zero if any frame failed — scriptable integrity, which the reference
pipeline never had.
"""

from __future__ import annotations

import argparse
import io as _io
import sys

import numpy as np

from .. import io as mio
from .. import presets

#: preset name -> FramedLink constructor (no-argument call)
PRESETS = {
    "reference": presets.reference_link,
    "wifi_like_ofdm": presets.wifi_like_ofdm_link,
    "dvb_like": presets.dvb_like_link,
    "ccsds_deep_space": presets.ccsds_deep_space_link,
    "lte_like_turbo": presets.lte_like_turbo_link,
    "nr_like_control": presets.nr_like_control_link,
}

BATCH_FRAMES = 16


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="link",
        description="coded framed link (CRC + FEC + chain) over stdio")
    p.add_argument("mode", choices=("tx", "rx"))
    p.add_argument("--preset", required=True, choices=sorted(PRESETS))
    p.add_argument("--noise-var", type=float, default=1.0,
                   help="rx: decision-point noise variance for LLR "
                        "scaling (soft-FEC beliefs)")
    p.add_argument("--batch-frames", type=int, default=BATCH_FRAMES,
                   help="frames processed per compiled batch")
    return p


def _frame_geometry(link):
    """Probe the per-frame waveform length with one host-side TX."""
    import jax.numpy as jnp
    z = jnp.zeros((1, link.payload_bits), jnp.int32)
    wave = link.tx(z)
    i, q = wave
    return int(np.asarray(i).shape[-1])


def run(args, stdin, stdout, stderr=None) -> int:
    import jax.numpy as jnp

    if isinstance(stdin, (bytes, bytearray)):
        stdin = _io.BytesIO(stdin)
    stderr = stderr if stderr is not None else sys.stderr
    link = PRESETS[args.preset]()
    pb = link.payload_bits
    batch = max(1, int(args.batch_frames))
    bad_total = 0

    if args.mode == "tx":
        pending = np.empty(0, np.uint8)
        def emit(frames_bits: np.ndarray) -> None:
            i, q = link.tx_fused(jnp.asarray(frames_bits, jnp.int32))
            iv = np.asarray(i).reshape(-1)
            qv = np.asarray(q).reshape(-1)
            stdout.write(mio.f32_to_f32le(mio.interleave_iq(iv, qv)))
        while True:
            raw = stdin.read(1 << 20)
            if not raw:
                break
            bits = mio.parse_ascii_bits(raw)
            pending = (np.concatenate([pending, bits]) if pending.size
                       else bits)
            full = (pending.size // (pb * batch)) * (pb * batch)
            for s in range(0, full, pb * batch):
                emit(pending[s: s + pb * batch].reshape(batch, pb))
            pending = pending[full:]
        n = pending.size // pb
        if n:
            emit(pending[: n * pb].reshape(n, pb))
        if pending.size % pb:
            print(f"link tx: dropped {pending.size % pb} trailing bits "
                  f"(< one {pb}-bit payload)", file=stderr)
        return 0

    # rx: fixed-length frames of interleaved f32 (i, q)
    flen = _frame_geometry(link)
    frame_bytes = flen * 2 * 4
    pending = b""
    while True:
        raw = stdin.read(1 << 20)
        chunk_done = not raw
        pending += raw or b""
        n = len(pending) // frame_bytes
        n = min(n, 10 ** 9) if chunk_done else (n // batch) * batch
        if n:
            x = mio.f32le_to_f32(pending[: n * frame_bytes])
            pending = pending[n * frame_bytes:]
            iq = x.reshape(n, flen, 2)
            payload, ok = link.rx_fused(
                (jnp.asarray(iq[..., 0]), jnp.asarray(iq[..., 1])),
                noise_var=args.noise_var)
            payload = np.asarray(payload)
            ok = np.asarray(ok)
            for f in range(n):
                stdout.write(mio.format_ascii_bits(payload[f]))
                stdout.write(b"\n")
                print(f"frame: {'OK' if bool(ok[f]) else 'BAD'}",
                      file=stderr)
            bad_total += int((~ok).sum())
        if chunk_done:
            if len(pending):
                print(f"link rx: dropped {len(pending)} trailing bytes "
                      f"(< one {frame_bytes}-byte frame)", file=stderr)
            break
    return 1 if bad_total else 0


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    raise SystemExit(run(args, sys.stdin.buffer, sys.stdout.buffer))


if __name__ == "__main__":
    main()

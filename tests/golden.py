"""Golden model: an independent per-sample NumPy implementation of the
reference modem's semantics, written directly from the formulas surveyed in
SURVEY.md section 2.3 (each class cites the reference file whose behavior it
models). Runs in float64 so it is the *accurate* rendition of those formulas;
the JAX block implementation must match it to f32 tolerance.

This is deliberately a second, independent implementation (sequential,
per-sample, stateful) so the block/prefix-sum inversion in modem_tpu is tested
against something with totally different failure modes.
"""

from __future__ import annotations

import math

import numpy as np

TWO_PI = 2.0 * math.pi


def mod_trig(x: float) -> float:
    return x - TWO_PI * math.floor(x / TWO_PI)


def bits_to_int(bits) -> int:
    v = 0
    for b in bits:
        v = (v << 1) | (int(b) & 1)
    return v


def sign(b) -> float:
    return 2.0 * int(b) - 1.0


# --- per-scheme phasors (update/i/q protocol mirroring digital/phasor.rs:1-12) ---


class GBASK:  # bask.rs:18-24
    bps = 1

    def __init__(self, a):
        self.a = a

    def update(self, s, b):
        pass

    def iq(self, s, b):
        return (int(b[0]) * self.a, 0.0)


class GBPSK:  # bpsk.rs:17-31
    bps = 1

    def __init__(self, phase, a):
        self.phase, self.a = phase, a

    def update(self, s, b):
        pass

    def iq(self, s, b):
        c = sign(b[0]) * self.a
        return (c * math.cos(self.phase), c * math.sin(self.phase))


class GQPSK:  # qpsk.rs:11-35
    bps = 2

    def __init__(self, phase, a):
        self.c, self.s = math.cos(phase), math.sin(phase)
        self.a = a * math.sqrt(0.5)

    def update(self, s, b):
        pass

    def iq(self, s, b):
        s0, s1 = sign(b[0]), sign(b[1])
        return (
            self.a * (s0 * self.c - s1 * self.s),
            self.a * (s1 * self.c + s0 * self.s),
        )


class GOQPSK:  # oqpsk.rs:19-25
    bps = 2

    def __init__(self, a):
        self.a = a * math.sqrt(0.5)

    def update(self, s, b):
        pass

    def iq(self, s, b):
        return (sign(b[0]) * self.a, sign(b[1]) * self.a)


class GDCQPSK:  # dcqpsk.rs:24-53
    bps = 2
    MAP = [0.0, math.pi / 2.0, 3.0 * math.pi / 2.0, math.pi]

    def __init__(self, a):
        self.a = a
        self.even = False

    def update(self, s, b):
        self.even = not self.even

    def iq(self, s, b):
        t = self.MAP[bits_to_int(b)] + (math.pi / 4.0 if self.even else 0.0)
        return (self.a * math.cos(t), self.a * math.sin(t))


class GMPSK:  # mpsk.rs:23-41
    def __init__(self, bps, phase_offset, a):
        self.bps, self.off, self.a = bps, phase_offset, a
        self.m = float(1 << bps)

    def update(self, s, b):
        pass

    def iq(self, s, b):
        t = TWO_PI * bits_to_int(b) / self.m + self.off
        return (self.a * math.cos(t), self.a * math.sin(t))


class GDMPSK:  # dmpsk.rs:26-41
    def __init__(self, bps, a, phase, shift):
        self.bps, self.a, self.phase, self.shift = bps, a, phase, shift

    def update(self, s, b):
        self.phase = mod_trig(self.phase + bits_to_int(b) * self.shift)

    def iq(self, s, b):
        return (self.a * math.cos(self.phase), self.a * math.sin(self.phase))


class GQAM:  # qam.rs:14-60
    def __init__(self, bps, phase, a):
        self.bps = bps
        self.cs = bps // 2
        self.ms = float((1 << self.cs) - 1)
        self.c, self.s = math.cos(phase), math.sin(phase)
        self.a = a / self.ms / 2.0

    def update(self, s, b):
        pass

    def iq(self, s, b):
        pm = 2.0 * bits_to_int(b[: self.cs]) - self.ms
        pl = 2.0 * bits_to_int(b[self.cs:]) - self.ms
        return (
            self.a * (pm * self.c - pl * self.s),
            self.a * (pl * self.c + pm * self.s),
        )


class GAPSK:  # apsk.rs:36-57
    def __init__(self, a, bps, rings):
        # rings: list of (start, end, radius, phase)
        self.a, self.bps, self.rings = a, bps, rings

    def update(self, s, b):
        pass

    def iq(self, s, b):
        sym = bits_to_int(b)
        for start, end, radius, phase in self.rings:
            if start <= sym < end:
                t = TWO_PI * (sym - start) / (end - start) + phase
                return (self.a * radius * math.cos(t), self.a * radius * math.sin(t))
        raise AssertionError("symbol not covered")


class GBFSK:  # bfsk.rs:23-55
    bps = 1

    def __init__(self, dev_hz, sr, a):
        self.w = TWO_PI * dev_hz / sr
        self.a = a
        self.phase = 0.0
        self.prev = 0

    def update(self, s, b):
        if b[0] == self.prev:
            return
        if b[0] == 1:
            self.phase = mod_trig(self.phase - self.w * s)
        else:
            self.phase = mod_trig(self.phase + self.w * (s - 1))
        self.prev = b[0]

    def iq(self, s, b):
        t = int(b[0]) * self.w * s + self.phase
        return (self.a * math.cos(t), self.a * math.sin(t))


class GMFSK:  # mfsk.rs:38-82
    def __init__(self, bps, dev_hz, sr, a, increase_map):
        self.bps = bps
        self.w = TWO_PI * dev_hz / sr
        self.a = a
        self.increase = increase_map
        self.max = (1 << bps) - 1
        self.phase = 0.0
        self.cur = 0.0

    def coef(self, sym):
        return float(2 * sym) if self.increase else float(2 * sym - self.max)

    def update(self, s, b):
        nxt = self.coef(bits_to_int(b))
        self.phase = mod_trig(self.phase + (self.cur - nxt) * self.w * s)
        self.cur = nxt

    def iq(self, s, b):
        t = self.cur * self.w * s + self.phase
        return (self.a * math.cos(t), self.a * math.sin(t))


class GCPFSK:  # cpfsk.rs:17-43
    def __init__(self, bps, br, sr, a, deviation):
        self.bps = bps
        self.w = TWO_PI * (deviation * br // 2) / sr
        self.a = a

    def update(self, s, b):
        pass

    def iq(self, s, b):
        t = 2.0 * bits_to_int(b) * self.w * s
        return (self.a * math.cos(t), self.a * math.sin(t))


class GMSK:  # msk.rs:12-35
    bps = 2

    def __init__(self, a, sps):
        assert sps % 2 == 0
        self.a = a
        self.spb = sps // 2

    def update(self, s, b):
        pass

    def iq(self, s, b):
        t = math.pi / 2.0 * s / self.spb
        return (
            self.a * sign(b[0]) * math.cos(t),
            -self.a * sign(b[1]) * math.sin(t),
        )


def make_golden(name, sr, br, a=1.0):
    """Scheme table mirroring the CLI constants (`modulate.rs:74-95`)."""
    sps = sr // br
    pi = math.pi
    return {
        "bask": lambda: GBASK(a),
        "bpsk": lambda: GBPSK(pi / 4, a),
        "bfsk": lambda: GBFSK(200, sr, a),
        "qpsk": lambda: GQPSK(0.0, a),
        "qam16": lambda: GQAM(4, 0.0, a),
        "qam256": lambda: GQAM(8, 0.0, a),
        "msk": lambda: GMSK(a, sps),
        "mfsk": lambda: GMFSK(4, 50, sr, a, True),
        "16psk": lambda: GMPSK(4, 0.0, a),
        "oqpsk": lambda: GOQPSK(a),
        "dcqpsk": lambda: GDCQPSK(a),
        "16cpfsk": lambda: GCPFSK(4, br, sr, a, 1),
        "16apsk": lambda: GAPSK(a, 4, [(0, 4, 0.5, pi / 4), (4, 16, 1.0, pi / 12)]),
        "dqpsk": lambda: GDMPSK(2, a, pi / 4, pi / 2),
        "dbpsk": lambda: GDMPSK(1, a, pi / 4, pi),
    }[name]()


STAGGERED = ("msk", "oqpsk")


def golden_modulate(name, bits, sr, br, cf, mode="iq", preamble_cycles=0):
    """Per-sample driver mirroring DigitalModulator (`modulator.rs:64-101`),
    the preamble path (`modulate.rs:118-126`) and EvenOddOffset staggering
    (`data.rs:81-123`). Returns [n, 2] (i, q) for mode='iq' or [n] passband
    for mode='passband'.
    """
    phasor = make_golden(name, sr, br)
    sps = sr // br
    bps = phasor.bps
    n_sym = len(bits) // bps
    wc = TWO_PI * cf / sr
    sample = 0  # carrier sample counter (carrier.rs:10-26)
    out = []

    if preamble_cycles:
        assert sr % cf == 0
        for _ in range(sr // cf * preamble_cycles - 1):
            out.append(math.cos(mod_trig(wc * sample)))
            sample += 1

    staggered = name in STAGGERED
    if staggered:
        assert bps == 2 and sps % 2 == 0
        groups = [bits[k * 2: k * 2 + 2] for k in range(n_sym)]
        cur = [0, 0]
    else:
        groups = [bits[k * bps: (k + 1) * bps] for k in range(n_sym)]

    for s_rel in range(n_sym * sps):
        phase = mod_trig(wc * sample)
        sample += 1
        if staggered:
            k = s_rel // sps
            if s_rel % sps == 0:
                cur[0] = groups[k][0]
                phasor.update(sample, cur)
            elif s_rel % (sps // 2) == 0:
                cur[1] = groups[k][1]
                phasor.update(sample, cur)
            b = cur
        else:
            b = groups[s_rel // sps]
            if s_rel % sps == 0:
                phasor.update(sample, b)
        i, q = phasor.iq(sample, b)
        if mode == "iq":
            out.append((i, q))
        else:
            out.append(i * math.cos(phase) - q * math.sin(phase))

    return np.asarray(out, dtype=np.float64)

"""Headline benchmark: flagship chain throughput on one chip.

Measures complex baseband samples/s through the full BASELINE.json config #2
pipeline — QPSK map -> RRC pulse shaping (full-rate waveform synthesis) ->
matched filter -> symbol decimation -> min-distance slicing -> bits — run as
the single fused Pallas kernel (:mod:`modem_tpu.ops.pallas_chain`), which
keeps the waveform VMEM-resident; HBM touches only the bit tensors.

Methodology notes (this environment's TPU sits behind an async tunnel whose
``block_until_ready`` does not reliably await remote execution):

* the per-block loop runs **on device** via ``lax.scan`` inside one jit, so
  host/tunnel latency cannot pipeline-fake the numbers;
* every block's decided bits are checksummed on device and the single scalar
  is fetched to the host inside the timing window — the work provably ran;
* the checksum must equal the input bit sum (the noiseless chain is exact),
  which is also the 0-BER correctness gate;
* the first synchronous fetch after compilation pays a large one-off tunnel
  anomaly (~2 min); it is absorbed before timing. Decided and input
  checksums are fetched through ONE compiled function — every separately
  compiled synchronous fetch pays that anomaly again;
* the device adds a fixed ~35 ms dispatch/fetch floor per jitted run, so
  the block count must be large enough to amortize it (see N_BLOCKS), and
  inputs are generated on-device (host transfer of GBs through the tunnel
  takes minutes).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
``vs_baseline`` relative to the 1e9 samples/s/chip target (BASELINE.md; the
reference publishes no numbers — SURVEY.md section 6).

Robustness (the tunnel can *hang* — block forever without erroring — or die
with ``Unable to initialize backend 'axon': UNAVAILABLE``): when invoked
normally this script acts as a thin orchestrator that re-executes itself as
a child subprocess (``BENCH_CHILD=1``) under a hard wall-clock deadline. The
parent never imports jax, so it cannot hang; it guarantees exactly one JSON
line on stdout on EVERY exit path:

* child prints a valid JSON line -> forwarded verbatim;
* child crashes with a backend-init ``UNAVAILABLE`` -> ONE bounded retry
  after a short pause (transient tunnel resets recover);
* child exceeds the per-attempt deadline (tunnel hang) -> killed, and the
  block count descends a fallback ladder (e.g. 512 -> 128 -> 16) so a sick
  but live tunnel still yields a smaller valid measurement;
* everything fails -> ``{"metric", "value": 0, ..., "error": ...}`` and a
  non-zero exit code.

Knobs: BENCH_DEADLINE (total seconds, default 1500), BENCH_ATTEMPT_DEADLINE
(per child attempt, default 600), BENCH_LADDER (comma list of block counts).

Subsystem attestation (round 5): after the flagship line, the parent
also runs ``bench_subsystems.py`` as a second child (budget
BENCH_SUBSYS_DEADLINE, default 900 s) and emits its
``{"subsystems": ...}`` summary line. Output order is flagship line,
subsystems line, flagship line again — the first print survives an
outer kill, the repeat keeps the LAST JSON line (what the driver
parses) the headline metric. BENCH_SUBSYSTEMS=0 disables.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

TARGET = 1e9  # samples/s/chip, BASELINE.md north star
MODE = os.environ.get("BENCH_MODE", "fused")
METRIC = ("flagship_chain_samples_per_s" if MODE == "fused"
          else f"{MODE}_chain_samples_per_s")


def _error_line(msg, **extra):
    rec = {"metric": METRIC, "value": 0.0, "unit": "samples/s",
           "vs_baseline": 0.0, "error": msg}
    rec.update(extra)
    return json.dumps(rec)


def _last_json_line(text):
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                continue
    return None


def _subsystems_line(t_end):
    """Run bench_subsystems.py as a child; return its JSON line or None.

    Never raises: the subsystem summary is strictly additive — any
    failure (disabled, out of budget, child crash/hang) just means the
    flagship line stands alone, as in rounds 1-4.
    """
    if os.environ.get("BENCH_SUBSYSTEMS", "1") != "1":
        return None
    budget = float(os.environ.get("BENCH_SUBSYS_DEADLINE", 900))
    remaining = t_end - time.monotonic() + budget  # extra window
    if remaining < 180:
        return None
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_subsystems.py")
    if not os.path.exists(script):
        return None
    env = dict(os.environ, BENCH_SUBSYS_DEADLINE=str(int(remaining - 60)))
    out = ""
    try:
        proc = subprocess.run([sys.executable, script], env=env,
                              capture_output=True, text=True,
                              timeout=remaining)
        out = proc.stdout or ""
    except subprocess.TimeoutExpired as e:
        out = (e.stdout.decode() if isinstance(e.stdout, bytes)
               else e.stdout) or ""
    except Exception:  # noqa: BLE001
        return None
    rec = _last_json_line(out)
    if rec is not None and "subsystems" in rec:
        return json.dumps(rec)
    return None


def orchestrate():
    deadline = float(os.environ.get("BENCH_DEADLINE", 1500))
    attempt_cap = float(os.environ.get("BENCH_ATTEMPT_DEADLINE", 600))
    base_blocks = int(os.environ.get("BENCH_BLOCKS", 512))
    ladder_env = os.environ.get("BENCH_LADDER")
    if ladder_env:
        ladder = [int(b) for b in ladder_env.split(",") if b.strip()]
    else:
        ladder = sorted({base_blocks, min(base_blocks, 128),
                         min(base_blocks, 16)}, reverse=True)
    t_end = time.monotonic() + deadline
    attempts, retried_unavailable = [], False

    for blocks in ladder:
        remaining = t_end - time.monotonic()
        if remaining < 60:
            break
        env = dict(os.environ, BENCH_CHILD="1", BENCH_BLOCKS=str(blocks))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=min(attempt_cap, remaining),
            )
        except subprocess.TimeoutExpired:
            attempts.append({"blocks": blocks, "outcome": "timeout"})
            continue  # tunnel hang: descend the ladder
        rec = _last_json_line(proc.stdout)
        if proc.returncode == 0 and rec is not None:
            if blocks != base_blocks:
                rec.setdefault("blocks", blocks)
                rec.setdefault("degraded", True)
            line = json.dumps(rec)
            print(line, flush=True)  # headline survives an outer kill
            sub = _subsystems_line(t_end)
            if sub is not None:
                print(sub, flush=True)
                print(line, flush=True)  # last JSON line = headline
            return 0
        tail = (proc.stderr or "")[-2000:]
        if "UNAVAILABLE" in tail and not retried_unavailable:
            retried_unavailable = True
            attempts.append({"blocks": blocks, "outcome": "unavailable"})
            time.sleep(min(30, max(0, t_end - time.monotonic() - 60)))
            ladder.insert(ladder.index(blocks) + 1, blocks)  # one retry
            continue
        attempts.append({"blocks": blocks, "outcome": f"rc={proc.returncode}",
                         "tail": tail[-300:]})

    why = ("tunnel timeout" if any(a["outcome"] == "timeout"
                                   for a in attempts)
           else "backend unavailable" if any(
               a["outcome"] == "unavailable" for a in attempts)
           else "all attempts failed")
    print(_error_line(why, attempts=attempts))
    return 1


if os.environ.get("BENCH_CHILD") != "1":
    sys.exit(orchestrate())

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# sitecustomize force-sets jax_platforms="axon,cpu"; an env var alone
# cannot override it — honor BENCH_PLATFORM=cpu via the config API.
if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
import jax.numpy as jnp

from modem_tpu import Rates
from modem_tpu.chain import qpsk_reference_chain

CHANNELS = int(os.environ.get("BENCH_CHANNELS", 256))
N_SYMBOLS = int(os.environ.get("BENCH_SYMBOLS", 4096))
# 512 blocks = 4.3 GSamp per pass. The device shows a fixed ~35 ms
# dispatch/fetch floor per jitted run (1M and 134M samples cost the same
# wall time), so small passes measure the floor, not the kernel: 16
# blocks -> 4.2 GSamp/s, 128 -> 13.1, 512 -> 19.4 (marginal ~23).
N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 512))
# MODE (fused | staged | passband | dmpsk | msk | resampled) and METRIC are
# defined at the top of the file, before the orchestrator/child split: the
# flagship metric is "fused"; the others produce the BENCH.md rows for the
# remaining end-to-end configurations (bits -> bits, on-device checksums).


def make_roundtrip(rates):
    if MODE in ("fused", "staged"):
        chain = qpsk_reference_chain(rates)
        return (chain.roundtrip_fused if MODE == "fused"
                else chain.roundtrip), chain.scheme.bits_per_symbol
    if MODE == "passband":
        from modem_tpu.chain import PulseShapedChain
        from modem_tpu.models.psk import QPSK

        chain = PulseShapedChain(QPSK(0.0, 1.0), rates, carrier_hz=2000)
        return chain.roundtrip_fused, 2
    if MODE == "dmpsk":
        from modem_tpu import make_scheme
        from modem_tpu.chain import DifferentialChain

        chain = DifferentialChain(make_scheme("dqpsk", rates), rates)
        return chain.roundtrip_fused, 2
    if MODE == "msk":
        from modem_tpu.chain import MskChain

        chain = MskChain(rates)
        return chain.roundtrip_fused, 2
    if MODE in ("resampled", "resampled_fused"):
        from modem_tpu.models.qam import QAM
        from modem_tpu.resampled import ResampledChain

        chain = ResampledChain(QAM(4, 0.0, 1.0), rates, up=3, down=2)
        return (chain.roundtrip_fused if MODE == "resampled_fused"
                else chain.roundtrip), 4
    raise SystemExit(f"unknown BENCH_MODE {MODE!r}")


def main():
    rates = Rates(baud_rate=1250, sample_rate=10000)  # sps = 8
    roundtrip, bps = make_roundtrip(rates)

    def run(blocks):
        def body(carry, blk):
            out = roundtrip(blk)
            return carry, jnp.sum(out)
        _, sums = jax.lax.scan(body, 0, blocks)
        # fetch decided-bit and input checksums together: every extra
        # synchronous fetch of a separately-compiled function pays the
        # tunnel's ~2 min first-sync anomaly once
        return jnp.stack([jnp.sum(sums), jnp.sum(blocks)])

    fn = jax.jit(run)

    # generate the bit blocks on-device: at the block counts needed to
    # amortize this device's ~35 ms fixed dispatch/fetch floor (measured:
    # 1M-sample and 134M-sample runs both cost ~33-38 ms), host transfer
    # of the input tensor through the tunnel would take minutes
    # int8 bits quarter the input-tensor HBM footprint/traffic (the fused
    # kernel consumes packed symbols either way; decisions come back int32)
    bit_dtype = jnp.dtype(os.environ.get("BENCH_BIT_DTYPE", "int8"))
    blocks = jax.jit(
        lambda k: jax.random.bernoulli(
            k, 0.5, (N_BLOCKS, CHANNELS, N_SYMBOLS * bps)
        ).astype(bit_dtype)
    )(jax.random.key(0))

    vals = np.asarray(fn(blocks))   # compile + first-sync tunnel anomaly
    checksum, expect = int(vals[0]), int(vals[1])
    if checksum != expect:
        print(json.dumps({"metric": METRIC,
                          "value": 0.0, "unit": "samples/s",
                          "vs_baseline": 0.0,
                          "error": "bit errors in noiseless roundtrip"}))
        return

    samples = N_BLOCKS * CHANNELS * N_SYMBOLS * rates.samples_per_symbol
    rates_seen = []
    for _ in range(5):  # >= 5 passes: this device varies ~±15% run-to-run
        t0 = time.perf_counter()
        vals = np.asarray(fn(blocks))
        dt = time.perf_counter() - t0
        if int(vals[0]) == expect:
            rates_seen.append(samples / dt)
    best = max(rates_seen, default=0.0)
    spread = ((max(rates_seen) - min(rates_seen)) / min(rates_seen)
              if len(rates_seen) >= 2 else 0.0)

    print(json.dumps({
        "metric": METRIC,
        "value": round(best, 1),
        "unit": "samples/s",
        "vs_baseline": round(best / TARGET, 3),
        "spread": round(spread, 3),
    }))


if __name__ == "__main__":
    main()

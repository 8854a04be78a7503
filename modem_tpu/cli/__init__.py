"""CLI entry points mirroring the reference binaries' flag and byte surface.

``python -m modem_tpu.cli.modulate`` and ``python -m modem_tpu.cli.demodulate``
reproduce `modulate`/`demodulate` (`/root/reference/src/bin/`, SURVEY.md
section 2.5): same flags, defaults, scheme table, and binary formats, with
block streaming + explicit state carry replacing the per-sample iterator pull.
"""

"""Runnable examples — the TPU-native analog of the reference's
``examples/src/main/java/boofcv/examples/`` tree (78 Java examples).

Each module is a self-contained demo: it synthesizes input with a known
ground truth, runs one library pipeline end-to-end, prints a checkable
result, and exits 0 on success.  Run as::

    python -m boofcv_tpu.examples.<name>

Examples default to the CPU backend (sub-second compiles; remote-TPU
sessions pay ~30 s per compile) — pass ``--tpu`` to run on the default
accelerator instead.
"""

from __future__ import annotations

import sys


def setup_backend(argv=None):
    """Force the CPU backend unless --tpu is passed.

    Returns the remaining argv.  Must be called before first jax backend
    use (mirrors tests/conftest.py).
    """
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--tpu" in argv:
        argv.remove("--tpu")
        return argv
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return argv

"""Interpret-mode Pallas context manager.

The Pallas kernels compile through Mosaic only on a real TPU; CPU-side
validation (tests, the driver's multi-chip dry run) runs them in the
Pallas interpreter instead by patching ``pl.pallas_call`` with
``interpret=True``. This helper centralizes the patch/restore idiom so
no copy forgets the ``finally``-restore (which would leave the
process-global ``pallas_call`` patched for subsequent code).
"""

from __future__ import annotations

import functools
from contextlib import contextmanager

from jax.experimental import pallas as pl


@contextmanager
def interpret_pallas():
    """Within the context, every ``pl.pallas_call`` runs interpreted."""
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        yield
    finally:
        pl.pallas_call = orig

"""Locating the upstream reference checkout (parity artifacts).

Parity tests and the analysis overlay compare against artifacts committed in
the reference repository (SURVEY.md §6: evaluations.npz, the baseline CSV,
best_model.zip).  The checkout lives at /root/reference on the build rig;
set ``ACAS2D_REFERENCE_DIR`` to point anywhere else.  Consumers degrade
gracefully (tests skip, the analysis overlay is omitted) when the directory
or a specific artifact is absent.
"""

from __future__ import annotations

import os

DEFAULT_REFERENCE_DIR = "/root/reference"


def reference_dir() -> str:
    """Root of the reference checkout (``ACAS2D_REFERENCE_DIR`` overrides)."""
    return os.environ.get("ACAS2D_REFERENCE_DIR", DEFAULT_REFERENCE_DIR)


def reference_path(*parts: str) -> str:
    """Join path components under :func:`reference_dir`."""
    return os.path.join(reference_dir(), *parts)

"""Misc utilities (reference: prosper/utils/__init__.py — SURVEY.md §2)."""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import jax


def create_output_path(basename: Optional[str] = None,
                       root: str = "output") -> str:
    """Create a timestamped results directory (process 0 creates, all agree).

    Reference: utils.create_output_path — timestamped results dirs
    (SURVEY.md §2 "Misc utils").
    """
    if basename is None:
        basename = os.path.splitext(os.path.basename(sys.argv[0]))[0] or "run"
    stamp = time.strftime("%Y-%m-%d+%H:%M")
    path = os.path.join(root, f"{basename}.{stamp}")
    # every process walks the same collision-suffix sequence (assumes a
    # shared filesystem, like the reference's MPI setup); only process 0
    # creates the directory
    suffix = 0
    final = path
    while os.path.exists(final):
        suffix += 1
        final = f"{path}.{suffix:03d}"
    if jax.process_index() == 0:
        os.makedirs(final, exist_ok=True)
    return final

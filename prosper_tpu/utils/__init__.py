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
    # Only process 0 walks the collision-suffix sequence and creates the
    # directory; the return value is authoritative ONLY on process 0 (a
    # shared-FS existence walk on other ranks races with the mkdir).  File
    # writers are rank-0-only throughout (DataLog handlers, checkpoints),
    # matching the reference's rank-0 file ownership; rank>0 callers that
    # need the real path must receive it via their own coordination.
    if jax.process_index() != 0:
        return path
    suffix = 0
    final = path
    while os.path.exists(final):
        suffix += 1
        final = f"{path}.{suffix:03d}"
    os.makedirs(final, exist_ok=True)
    return final

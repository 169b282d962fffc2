"""Shared BASELINE.md section writer for the BENCH harnesses.

One implementation of the replace-own-section protocol: a rerun replaces
the harness's own ``## ...`` section in place, preserving every section
that follows (a blind marker-to-EOF truncation once silently deleted the
sections of whichever harness ran earlier — this helper exists so no
harness re-introduces that bug by hand-rolling the splice)."""

from __future__ import annotations

import os


def replace_section(path: str, marker: str, body: str) -> None:
    """Replace the section starting at ``marker`` (a ``"\\n## ..."``
    heading prefix) with ``body``; sections after it are preserved, and
    the fresh section is appended at the end if absent."""
    existing = open(path).read() if os.path.exists(path) else ""
    if marker in existing:
        start = existing.index(marker)
        nxt = existing.find("\n## ", start + 1)
        existing = existing[:start] + (existing[nxt:] if nxt >= 0 else "")
    with open(path, "w") as f:
        f.write(existing + body)

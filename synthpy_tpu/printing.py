"""ANSI colour helpers for terminal narration.

Parity with the reference's ``printing.colour`` registry (reference
src/simulator/printing.py:1-11), plus a ``paint`` helper and automatic
no-op when stdout is not a TTY (HPC logs stay clean — the reference
embeds raw escape codes in batch logs, which its own
evaluation/error_reading/error_parser.py then has to strip back out;
``synthpy_tpu.utils.strip_ansi`` covers reading such legacy logs).
"""

from __future__ import annotations

import os
import sys


class colour:
    """ANSI escape codes, reference-compatible names."""

    PURPLE = "\033[95m"
    CYAN = "\033[96m"
    DARKCYAN = "\033[36m"
    BLUE = "\033[94m"
    GREEN = "\033[92m"
    YELLOW = "\033[93m"
    RED = "\033[91m"
    BOLD = "\033[1m"
    UNDERLINE = "\033[4m"
    END = "\033[0m"


def _tty() -> bool:
    if os.environ.get("NO_COLOR"):
        return False
    try:
        return sys.stdout.isatty()
    except Exception:
        return False


def paint(text: str, *codes: str) -> str:
    """Wrap ``text`` in the given colour codes when stdout is a TTY."""
    if not codes or not _tty():
        return text
    return "".join(codes) + text + colour.END


__all__ = ["colour", "paint"]

"""Command-line entry points (python -m synthpy_tpu.cli.<tool>)."""

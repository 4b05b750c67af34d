"""Rehearsal / pipeline entry scripts (run directly: `python jobs/<x>.py`).
Package marker so scripts can share `jobs._metrics` after their
repo-root sys.path insert."""

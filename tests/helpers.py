"""Shared test helpers (imported as a plain module — tests/ is on
sys.path via conftest)."""

from __future__ import annotations


def canon(df):
    """Order-insensitive stringly canonical form of a DataFrame —
    columns sorted by name, rows sorted, every cell stringified.  One
    implementation so parity tests cannot drift apart (r6 review)."""
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in row) for row in df.select(*cols).collect())

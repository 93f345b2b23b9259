"""Shared token-axis tiling/chunking policy for the fused Pallas kernels.

The fused FF and QKV kernels flatten their inputs to ``(tokens, c)`` and
(a) pick a power-of-2 forward tile that divides the token count, and
(b) chunk their XLA-recompute backwards over tokens to bound the fp32
recompute temps (see fused_ff.py's module docstring for the full-res OOM
this prevents). One policy, one place — the kernels wrap these with their
own budget constants so tests can monkeypatch per-kernel.
"""

from __future__ import annotations


def tile_rows(rows: int, target: int) -> int:
    """Largest power-of-2 divisor of ``rows`` that is <= ``target``."""
    t = 1
    best = 1
    while t <= target:
        if rows % t == 0:
            best = t
        t *= 2
    return best


def bwd_chunks(n: int, width: int, temp_bytes: int) -> int:
    """Smallest power-of-2 chunk count (dividing ``n``) keeping fp32
    ``(rows, width)`` backward-recompute temps under ``temp_bytes``."""
    target_rows = max(temp_bytes // (width * 4), 1)
    chunks = 1
    while n % (chunks * 2) == 0 and n // chunks > target_rows:
        chunks *= 2
    return chunks

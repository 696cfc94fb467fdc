"""Tiny shared numeric helpers."""

from __future__ import annotations


def cdiv(a: int, b: int) -> int:
    """Ceil division for non-negative integers."""
    return -(-a // b)


def round_up(a: int, b: int) -> int:
    """Round a up to the next multiple of b."""
    return cdiv(a, b) * b

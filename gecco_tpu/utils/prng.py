"""PRNG helpers (parity with gecco-jax/src/gecco_jax/models/util.py:8-16)."""

from __future__ import annotations

from typing import Iterator

import jax

__all__ = ["splitter"]


def splitter(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite generator of fresh PRNG keys derived from ``key``."""
    while True:
        key, sub = jax.random.split(key)
        yield sub

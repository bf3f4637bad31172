"""Trace-time shape validation.

The reference decorates nearly every function with ``@dimchecked`` shape
annotations checked at trace time (SURVEY.md §4.1). Static shapes make this
free under jit: these are plain Python asserts on ``.shape`` evaluated once
per trace, raising immediately with the offending shape.
"""

from __future__ import annotations

__all__ = ["check_points", "check_sigma_batch", "check_image_batch"]


def check_points(x, name: str = "points", dims: int = 3):
    """Assert ``x`` is a batched point set [B, N, D]."""
    if x.ndim != dims or x.shape[-1] < 1:
        raise ValueError(
            f"{name} must be [B, N, D] (got shape {tuple(x.shape)})"
        )
    return x


def check_sigma_batch(sigma, batch: int):
    if sigma.ndim not in (0, 1):
        raise ValueError(f"sigma must be scalar or [B] (got {tuple(sigma.shape)})")
    if sigma.ndim == 1 and sigma.shape[0] != batch:
        raise ValueError(
            f"sigma batch {sigma.shape[0]} does not match points batch {batch}"
        )
    return sigma


def check_image_batch(image, name: str = "ctx.image"):
    if image is not None and hasattr(image, "ndim") and image.ndim != 4:
        raise ValueError(
            f"{name} must be [B, H, W, C] channels-last (got {tuple(image.shape)})"
        )
    return image

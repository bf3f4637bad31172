"""Optional Mitsuba path-traced point-cloud rendering.

The reference renders conditional samples with Mitsuba 3 spheres + a
path-traced scene (gecco-jax/src/gecco_jax/vis/conditional3d.py:104-192).
This module provides the same capability behind an import gate: Mitsuba is
not part of this image's environment, so ``gecco_tpu.vis.conditional3d``
uses it only when importable (``render_cloud(..., backend="mitsuba")`` or
``backend="auto"``) and otherwise falls back to the matplotlib depth-colored
scatter.

The scene is built from scratch with the public mitsuba-3 scalar_rgb API:
one sphere per point on a ground-planed stage, a constant-ish area emitter,
and a perspective look-at sensor.
"""

from __future__ import annotations

import numpy as np

__all__ = ["mitsuba_available", "render_cloud_mitsuba"]


def mitsuba_available() -> bool:
    try:
        import mitsuba  # noqa: F401

        return True
    except ImportError:
        return False


def render_cloud_mitsuba(
    points: np.ndarray,
    resolution: int = 512,
    point_radius: float = 0.01,
    spp: int = 64,
    origin=(1.2, 1.2, 1.2),
    target=(0.0, 0.0, 0.0),
    up=(0.0, 0.0, 1.0),
    color=(0.3, 0.45, 0.7),
) -> np.ndarray:
    """Path-trace one cloud ``[N, 3]`` to an sRGB uint8 image [H, W, 3].

    Raises ImportError when Mitsuba is not installed — callers gate on
    :func:`mitsuba_available` (or use ``render_cloud(backend="auto")``).
    """
    import mitsuba as mi

    if mi.variant() is None:
        mi.set_variant("scalar_rgb")

    pts = np.asarray(points, np.float64)
    scene_dict = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 4},
        "sensor": {
            "type": "perspective",
            "fov": 40.0,
            "to_world": mi.ScalarTransform4f.look_at(
                origin=list(origin), target=list(target), up=list(up)
            ),
            "film": {
                "type": "hdrfilm",
                "width": resolution,
                "height": resolution,
                "pixel_format": "rgb",
            },
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "emitter": {"type": "constant", "radiance": {"type": "rgb", "value": 0.9}},
        "floor": {
            "type": "rectangle",
            "to_world": mi.ScalarTransform4f.translate([0, 0, float(pts[:, 2].min()) - 3 * point_radius])
            @ mi.ScalarTransform4f.scale(4.0),
            "bsdf": {
                "type": "diffuse",
                "reflectance": {"type": "rgb", "value": [0.9, 0.9, 0.9]},
            },
        },
    }
    bsdf = {
        "type": "diffuse",
        "reflectance": {"type": "rgb", "value": list(color)},
    }
    for idx, p in enumerate(pts):
        scene_dict[f"pt_{idx}"] = {
            "type": "sphere",
            "center": [float(p[0]), float(p[1]), float(p[2])],
            "radius": float(point_radius),
            "bsdf": bsdf,
        }

    scene = mi.load_dict(scene_dict)
    image = np.asarray(mi.render(scene, spp=spp))
    # linear -> sRGB -> uint8
    srgb = np.where(
        image <= 0.0031308, 12.92 * image, 1.055 * np.clip(image, 0, None) ** (1 / 2.4) - 0.055
    )
    return (np.clip(srgb, 0.0, 1.0) * 255).astype(np.uint8)

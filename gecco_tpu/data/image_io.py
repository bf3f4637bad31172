"""Fast image loading for the data pipeline.

Decodes with cv2 (libjpeg-turbo; ~40% faster than PIL on 256^2 jpgs here)
when available, PIL otherwise, and returns **uint8 RGB**: normalization to
[0, 1] happens on DEVICE (``ConvNeXt.__call__``) — the host-side
``astype(float32)/255`` costs 4x the collation memcpy and 4x the
host->device transfer bytes, which matters on this 1-core relay host
(round-4 VERDICT #7: the image-conditional loader ran at 0.5x the device's
step demand before this).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    def load_rgb_uint8(path: str) -> np.ndarray:
        """[H, W, 3] uint8 RGB."""
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"failed to decode image: {path}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

except ImportError:  # pragma: no cover - cv2 is present in the dev image

    def load_rgb_uint8(path: str) -> np.ndarray:
        """[H, W, 3] uint8 RGB."""
        from PIL import Image

        img = np.asarray(Image.open(path))
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        return img[..., :3]

"""Instance-mask visualization.

Capability parity with reference `utils/data_visualization.py:14-42`
(`visualize_mask`): random-colored transparent overlay per instance plus the
object id drawn at the instance centroid — implemented with numpy + cv2
(no matplotlib Agg round-trip).
"""

import numpy as np


def visualize_mask(img, mask, transparency=0.7, show_ids=True, seed=0):
    """Overlay an instance mask on an image.

    Args:
        img: (3, H, W) or (H, W, 3) float [0,1] or uint8 image.
        mask: (H, W) int instance ids, 0 = background.
        transparency: overlay alpha for non-background pixels.
    Returns:
        (H, W, 3) uint8 image.
    """
    import cv2

    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] == 3 and img.shape[-1] != 3:
        img = np.moveaxis(img, 0, -1)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    img = img.copy()
    H, W = mask.shape
    if img.shape[:2] != (H, W):
        img = cv2.resize(img, (W, H))

    rng = np.random.RandomState(seed)
    n = int(mask.max())
    colors = rng.randint(0, 255, size=(n + 1, 3)).astype(np.uint8)
    overlay = colors[mask]
    fg = (mask > 0)[..., None]
    blended = np.where(
        fg,
        (img * (1 - transparency) + overlay * transparency).astype(np.uint8),
        img)

    if show_ids:
        for k in range(1, n + 1):
            ys, xs = np.nonzero(mask == k)
            if ys.size == 0:
                continue
            cx, cy = int(xs.mean()), int(ys.mean())
            cv2.putText(blended, str(k), (cx, cy),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, (255, 255, 255), 1,
                        cv2.LINE_AA)
    return blended

"""Arnold license-watermark mask, derived from the goldens themselves.

Every reference golden was rendered in watermarked mode (`skip_license_check
on` renders without a license, which stamps the "arnold" banner across rows
~28-108; visible as grey letters on the black backgrounds of cases 0003 and
0009). The overlay is unmatchable content for any re-implementation, so the
harness reports BOTH the full-frame RMSE and the RMSE with the letter pixels
masked, gating on the latter.

The mask is extracted at runtime from the goldens (letters against the black
backgrounds of the two standalone scenes), not hand-drawn: threshold inside
the banner band, exclude each scene's own bright content, union, and a small
morphological closing. ~2.7% of the frame.
"""
from __future__ import annotations

import os

import numpy as np


def _shift(m: np.ndarray, dy: int, dx: int) -> np.ndarray:
    out = np.zeros_like(m)
    h, w = m.shape
    ys = slice(max(dy, 0), h + min(dy, 0))
    xs = slice(max(dx, 0), w + min(dx, 0))
    yd = slice(max(-dy, 0), h + min(-dy, 0))
    xd = slice(max(-dx, 0), w + min(-dx, 0))
    out[ys, xs] = m[yd, xd]
    return out


def _dilate(m: np.ndarray, it: int = 1) -> np.ndarray:
    for _ in range(it):
        m = (m | _shift(m, 1, 0) | _shift(m, -1, 0)
             | _shift(m, 0, 1) | _shift(m, 0, -1))
    return m


def _smooth(a: np.ndarray, it: int = 3) -> np.ndarray:
    for _ in range(it):
        a = 0.25 * (_shiftf(a, 1, 0) + _shiftf(a, -1, 0)
                    + _shiftf(a, 0, 1) + _shiftf(a, 0, -1))
    return a


def _shiftf(a: np.ndarray, dy: int, dx: int) -> np.ndarray:
    return np.roll(np.roll(a, dy, axis=0), dx, axis=1)


def watermark_mask(suite: str) -> np.ndarray | None:
    """(256, 256) bool mask of watermark letter pixels, or None if the
    donor goldens are unavailable."""
    from ..io import exr

    p9 = os.path.join(suite, "mtoa", "0009", "ref", "ref.exr")
    p3 = os.path.join(suite, "mtoa", "0003", "ref", "ref.exr")
    if not (os.path.exists(p9) and os.path.exists(p3)):
        return None
    l9 = exr.read_rgb(p9).mean(-1)
    l3 = exr.read_rgb(p3).mean(-1)
    if l9.shape != (256, 256) or l3.shape != (256, 256):
        return None
    band = np.zeros((256, 256), bool)
    band[28:108] = True
    # 0009: letters on black; exclude the bright planes
    m9 = band & (l9 > 0.006) & ~_dilate(l9 > 0.12, 2)
    # 0003: letters on black; exclude the smooth specular glow
    m3 = band & (l3 > 0.006) & ~_dilate(_smooth(l3) > 0.02, 2)
    wm = _dilate(m9 | m3, 1)
    return wm

"""Pin the watermark mask (VERDICT r3 weak#5).

The golden gate is measured on watermark-masked pixels, so the mask itself
must be immutable across rounds: the derivation in utils/watermark.py must
keep reproducing the checked-in wm_mask_256.bits bit-for-bit, and its
coverage must never exceed the pinned value. Any intentional mask change
must re-pin the artifact + hash in the same commit.
"""
import hashlib
import os

import numpy as np
import pytest

from rlshaders_tpu.utils import watermark

SUITE = "/root/reference/testsuite"


def test_pinned_mask_loads_and_matches_hash():
    m = watermark.pinned_mask()
    assert m.shape == (256, 256) and m.dtype == bool
    assert hashlib.sha256(m.tobytes()).hexdigest() == watermark.PINNED_SHA256
    assert m.mean() == pytest.approx(watermark.PINNED_COVERAGE, abs=1e-9)


@pytest.mark.skipif(not os.path.isdir(SUITE), reason="reference suite absent")
def test_derived_mask_reproduces_pinned():
    derived = watermark.watermark_mask(SUITE)
    assert derived is not None
    pinned = watermark.pinned_mask()
    assert np.array_equal(derived, pinned), (
        f"derived mask diverged from pin: coverage {derived.mean():.4f} "
        f"vs pinned {pinned.mean():.4f}, "
        f"{int((derived ^ pinned).sum())} differing pixels"
    )

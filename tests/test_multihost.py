"""Multi-host input sharding (parallel/multihost.py + TrainLoader shard=).

A real pod slice can't be simulated in one process, so the host-sharding
logic is validated structurally: with ``shard=(pi, pc)`` the per-host
streams must tile the unsharded global stream exactly, each host's local
batch must keep the >=1-fake-per-pair guarantee, and
``make_global_batch`` must produce a correctly batch-sharded global
array on the virtual 8-device mesh (process_count=1 here — the
``jax.make_array_from_process_local_data`` call path is identical).
"""

import numpy as np
import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.data.dataset import (
    SegArtifactDataset,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.data.pipeline import (
    TrainLoader,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.data.synthetic import (
    generate_synthetic_dataset,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.parallel import (
    host_shard,
    local_merge,
    make_global_batch,
    make_mesh,
)


@pytest.fixture(scope="module")
def loader(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mh_synth"))
    generate_synthetic_dataset(root, img_size=32)
    lists = f"{root}/lists"
    fake = SegArtifactDataset(root, lists, "fake_train")
    real = SegArtifactDataset(root, lists, "real_train_all")
    return TrainLoader(fake, real, img_size=32, seed=3, num_workers=2)


MERGE = 4  # global pairs per step -> global batch 8


def test_host_shards_tile_the_global_stream(loader):
    global_batches = list(loader.epoch_batches_merged(0, MERGE))
    for pc in (2, 4):
        per_host = [list(loader.epoch_batches_merged(0, MERGE, shard=(pi, pc)))
                    for pi in range(pc)]
        assert all(len(h) == len(global_batches) for h in per_host)
        rows = 2 * MERGE // pc
        for step, gb in enumerate(global_batches):
            img = np.concatenate([per_host[pi][step]["image"]
                                  for pi in range(pc)])
            lab = np.concatenate([per_host[pi][step]["label"]
                                  for pi in range(pc)])
            names = sum((per_host[pi][step]["case_name"]
                         for pi in range(pc)), [])
            assert per_host[0][step]["image"].shape[0] == rows
            np.testing.assert_array_equal(img, gb["image"])
            np.testing.assert_array_equal(lab, gb["label"])
            assert names == gb["case_name"]


def test_each_host_pair_keeps_fake_guarantee(loader):
    # synthetic fake ids start with "09" (reference naming convention)
    for pi in range(2):
        for batch in loader.epoch_batches_merged(1, MERGE, shard=(pi, 2)):
            names = batch["case_name"]
            for k in range(0, len(names), 2):
                pair = names[k:k + 2]
                assert any(n.startswith("09") for n in pair), pair


def test_shard_validation(loader):
    with pytest.raises(ValueError, match="not divisible"):
        next(loader.epoch_batches_merged(0, 3, shard=(0, 2)))
    with pytest.raises(ValueError, match="bad shard"):
        next(loader.epoch_batches_merged(0, 4, shard=(2, 2)))


def test_make_global_batch_sharded_on_mesh(loader):
    mesh = make_mesh(n_data=8)
    batch = next(loader.epoch_batches_merged(0, MERGE))  # global batch 8
    gb = make_global_batch(batch, mesh)
    assert gb["image"].shape == (8, 32, 32, 3)
    assert gb["label"].shape[0] == 8
    assert gb["case_name"] == batch["case_name"]
    # batch axis sharded over 'data': each device holds 1 row
    shard_shapes = {s.data.shape for s in gb["image"].addressable_shards}
    assert shard_shapes == {(1, 32, 32, 3)}
    np.testing.assert_array_equal(np.asarray(gb["image"]), batch["image"])


def test_host_shard_single_process():
    assert host_shard() == (0, 1)
    assert local_merge(8) == 8

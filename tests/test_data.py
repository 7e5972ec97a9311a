"""Data pipeline tests: dataset, augment, sampler, loader, masks, splits."""

import os
import textwrap

import numpy as np
import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.data import (
    BatchPatternSampler,
    EvalLoader,
    RandomGenerator,
    SegArtifactDataset,
    TrainLoader,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.data.augment import sample_rng
from semantic_segmentation_of_stylegan2_artifacts_tpu.data.build_mask import (
    build_masks,
    make_mask_for_image,
    parse_points,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.data.pipeline import (
    num_real_for_ratio,
    real_ratio_schedule,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.data.splits import (
    split_composition,
    split_train_in_real_and_fake,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.data.synthetic import (
    generate_synthetic_dataset,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    generate_synthetic_dataset(root, img_size=32)
    return root


def test_dataset_resolution_and_shapes(synth_root):
    ds = SegArtifactDataset(synth_root, os.path.join(synth_root, "lists"), "train")
    assert len(ds) == 10
    s = ds[0]
    assert s["image"].shape == (32, 32, 3) and s["image"].dtype == np.uint8
    assert s["label"].shape == (32, 32) and s["label"].dtype == np.uint8
    # fake sample has artifacts, real has empty mask
    fake_ds = SegArtifactDataset(synth_root, os.path.join(synth_root, "lists"),
                                 "fake_train")
    real_ds = SegArtifactDataset(synth_root, os.path.join(synth_root, "lists"),
                                 "real_train_all")
    assert fake_ds[0]["label"].max() == 255
    assert real_ds[0]["label"].max() == 0


def test_dataset_missing_sample_raises(synth_root, tmp_path):
    lists = str(tmp_path)
    with open(os.path.join(lists, "bad.txt"), "w") as f:
        f.write("999999\n")
    ds = SegArtifactDataset(synth_root, lists, "bad")
    with pytest.raises(FileNotFoundError):
        ds[0]


def test_augment_deterministic_per_key(synth_root):
    ds = SegArtifactDataset(synth_root, os.path.join(synth_root, "lists"),
                            "fake_train")
    t = RandomGenerator([32, 32], random_flip_flag=True, transform=True, seed=7)
    s = ds[0]
    a = t(dict(s), rng=sample_rng(7, 3, 0))
    b = t(dict(s), rng=sample_rng(7, 3, 0))
    c = t(dict(s), rng=sample_rng(7, 4, 0))
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["label"], b["label"])
    assert not np.array_equal(a["image"], c["image"])  # epoch changes draw


def test_augment_label_binarized_and_flip_consistent(synth_root):
    ds = SegArtifactDataset(synth_root, os.path.join(synth_root, "lists"),
                            "fake_train")
    t = RandomGenerator([32, 32], random_flip_flag=True, transform=False, seed=0)
    # find an rng that flips: flip when rng.random() > 0.5 after no-transform
    s = ds[0]
    out = t(dict(s), rng=np.random.default_rng(1))
    assert set(np.unique(out["label"])) <= {0, 1}
    # eval transform (no aug, no flip) is identity on image
    te = RandomGenerator([32, 32], random_flip_flag=False, transform=False)
    oe = te(dict(s))
    np.testing.assert_array_equal(oe["image"], s["image"])


def test_augment_wrong_size_raises(synth_root):
    ds = SegArtifactDataset(synth_root, os.path.join(synth_root, "lists"),
                            "fake_train")
    t = RandomGenerator([64, 64], transform=False)
    with pytest.raises(ValueError, match="Wrong image size"):
        t(ds[0])


def test_sampler_every_batch_has_fake():
    fake = list(range(6))
    real = list(range(100, 104))
    s = BatchPatternSampler(fake, real, num_batch=5, batch_size=2, epoch=1)
    batches = list(s)
    assert len(batches) == 5
    seen = [i for b in batches for i in b]
    assert sorted(seen) == sorted(fake + real)
    for b in batches:
        assert any(i < 100 for i in b), f"batch without fake: {b}"


def test_sampler_deterministic_per_epoch():
    fake = list(range(8))
    real = list(range(100, 104))
    a = list(BatchPatternSampler(fake, real, 6, 2, epoch=3))
    b = list(BatchPatternSampler(fake, real, 6, 2, epoch=3))
    c = list(BatchPatternSampler(fake, real, 6, 2, epoch=4))
    assert a == b
    assert a != c


def test_sampler_validation_errors():
    with pytest.raises(ValueError, match="batch_size"):
        BatchPatternSampler([1], [2], 1, 3, 1)
    with pytest.raises(ValueError, match="fake"):
        BatchPatternSampler([], [1], 1, 2, 1)
    with pytest.raises(ValueError, match="num fake \\+ num real"):
        BatchPatternSampler([1, 2], [3], 2, 2, 1)


def test_real_ratio_schedule_reference_piecewise():
    assert real_ratio_schedule(0, True) == 0.1
    assert abs(real_ratio_schedule(9, True) - 0.13) < 1e-9
    assert abs(real_ratio_schedule(19, True) - 0.43) < 1e-9
    assert real_ratio_schedule(25, True) == 0.4
    assert real_ratio_schedule(32, True) == 0.2
    assert real_ratio_schedule(50, True) == 0.4
    assert real_ratio_schedule(12, False) == 0.4


def test_num_real_even_mixed_size():
    n = num_real_for_ratio(800, 1157, 0.4)
    assert (800 + n) % 2 == 0
    with pytest.raises(ValueError):
        num_real_for_ratio(800, 10, 0.4)


def test_train_loader_epoch(synth_root):
    lists = os.path.join(synth_root, "lists")
    fake_ds = SegArtifactDataset(synth_root, lists, "fake_train")
    real_ds = SegArtifactDataset(synth_root, lists, "real_train_all")
    loader = TrainLoader(fake_ds, real_ds, img_size=32, seed=0,
                         dynamic_loader=False, num_workers=2)
    batches = list(loader.epoch_batches(0))
    assert len(batches) == loader.num_batches(0)
    for b in batches:
        assert b["image"].shape == (2, 32, 32, 3)
        assert b["image"].dtype == np.uint8
        assert b["label"].shape == (2, 32, 32)
        assert set(np.unique(b["label"])) <= {0, 1}
        assert any(n.startswith("09") for n in b["case_name"])
    # deterministic epoch
    again = list(loader.epoch_batches(0))
    np.testing.assert_array_equal(batches[0]["image"], again[0]["image"])


def test_eval_loader(synth_root):
    lists = os.path.join(synth_root, "lists")
    ds = SegArtifactDataset(synth_root, lists, "val")
    loader = EvalLoader(ds, img_size=32)
    out = list(loader)
    assert len(out) == len(ds) == 3
    assert out[0]["image"].shape == (1, 32, 32, 3)
    names = [o["case_name"][0] for o in out]
    assert names == ds.sample_list  # order preserved


def test_build_mask_from_cvat_xml(tmp_path):
    xml = textwrap.dedent("""\
        <annotations>
          <version>1.1</version>
          <image id="0" name="091234.png" width="32" height="32">
            <polygon label="Artefakt" points="4,4;20,4;20,20;4,20"/>
            <polygon label="Other" points="0,0;5,0;5,5"/>
            <polygon label="Artefakt" points="1,1"/>
          </image>
          <image id="1" name="091235.png" width="32" height="32"/>
        </annotations>
    """)
    p = tmp_path / "ann.xml"
    p.write_text(xml)
    out = tmp_path / "masks"
    n = build_masks(str(p), str(out))
    assert n == 2
    from PIL import Image
    m = np.asarray(Image.open(out / "091234_mask.png"))
    assert m[10, 10] == 255 and m[30, 30] == 0
    assert set(np.unique(m)) <= {0, 255}
    m2 = np.asarray(Image.open(out / "091235_mask.png"))
    assert m2.max() == 0


def test_parse_points_malformed():
    assert parse_points("1,2;3,4;bad;5,6,7;8,9") == [(1, 2), (3, 4), (8, 9)]
    assert parse_points("") == []


def test_split_utilities(synth_root):
    lists = os.path.join(synth_root, "lists")
    comp = split_composition(lists, "val")
    assert comp == {"total": 3, "fake": 2, "real": 1}
    fake, real = split_train_in_real_and_fake(lists)
    assert all(n.startswith("09") for n in fake)
    assert not any(n.startswith("09") for n in real)
    assert len(fake) == 6 and len(real) == 4


def test_create_splits_random(tmp_path, synth_root):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.data.splits import (
        create_splits_random,
    )
    out = str(tmp_path / "lists2")
    splits = create_splits_random(
        os.path.join(synth_root, "real_images"),
        os.path.join(synth_root, "fake_images"),
        out, n_val_fake=2, n_val_real=1, n_test_fake=2, n_test_real=1,
    )
    assert len(splits["val"]) == 3 and len(splits["test"]) == 3
    all_ids = [i for s in splits.values() for i in s]
    assert len(all_ids) == len(set(all_ids))  # disjoint
    assert os.path.exists(os.path.join(out, "train.txt"))

"""Metric kernels + aggregation + CSV schema tests."""

import csv
import os

import numpy as np
import jax.numpy as jnp
import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.metrics import (
    CSVHandler,
    MetricsAggregator,
    compute_case_metrics_jit,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.metrics.segmentation import (
    to_case_metrics,
)


def _case(probs, label, thr=0.5, name="c", loss=0.1):
    m = compute_case_metrics_jit(jnp.asarray(probs), jnp.asarray(label), thr)
    return to_case_metrics(name, m, loss)


def test_confusion_counts_hand_example():
    # 4x4: gt has 4 positives; pred_bin has 3 hits + 2 false alarms
    gt = np.zeros((4, 4), np.float32)
    gt[0, 0] = gt[0, 1] = gt[1, 0] = gt[1, 1] = 1
    p = np.zeros((4, 4), np.float32)
    p[0, 0] = p[0, 1] = p[1, 0] = 0.9   # 3 TP
    p[3, 3] = p[3, 2] = 0.8             # 2 FP
    c = _case(p, gt)
    assert (c.tp, c.fp, c.fn, c.tn) == (3, 2, 1, 10)
    assert abs(c.accuracy - 13 / 16) < 1e-6
    assert abs(c.bin_dice - 2 * 3 / (2 * 3 + 2 + 1)) < 1e-6
    assert abs(c.bin_recall - 3 / 4) < 1e-6
    assert abs(c.bin_precision - 3 / 5) < 1e-6
    assert abs(c.bin_iou - 3 / 6) < 1e-6
    assert not c.is_real


def test_soft_dice_matches_formula():
    rng = np.random.RandomState(0)
    p = rng.rand(8, 8).astype(np.float32)
    gt = (rng.rand(8, 8) > 0.5).astype(np.float32)
    c = _case(p, gt)
    smooth = 1e-8
    want = (2 * (p * gt).sum() + smooth) / ((p * p).sum() + (gt * gt).sum() + smooth)
    assert abs(c.soft_dice - want) < 1e-5
    want_iou = ((p * gt).sum() + smooth) / (p.sum() + gt.sum() - (p * gt).sum() + smooth)
    assert abs(c.soft_iou - want_iou) < 1e-5


def test_real_case_fpr():
    gt = np.zeros((4, 4), np.float32)
    p = np.zeros((4, 4), np.float32)
    p[0, 0] = 0.9  # one false positive
    c = _case(p, gt)
    assert c.is_real
    assert abs(c.fpr - 1 / 16) < 1e-6
    assert abs(c.accuracy - 15 / 16) < 1e-6


def test_threshold_semantics_strictly_greater():
    gt = np.zeros((2, 2), np.float32)
    p = np.full((2, 2), 0.5, np.float32)
    c = _case(p, gt, thr=0.5)
    assert c.fp == 0  # p > thr is strict


def test_aggregator_score():
    agg = MetricsAggregator()
    gt_f = np.zeros((4, 4), np.float32); gt_f[:2, :2] = 1
    p_good = np.where(gt_f > 0, 0.95, 0.02).astype(np.float32)
    agg.add(_case(p_good, gt_f, name="fake1"))
    gt_r = np.zeros((4, 4), np.float32)
    p_real = np.zeros((4, 4), np.float32)
    agg.add(_case(p_real, gt_r, name="real1"))
    s = agg.summarize(epoch=1, mean_train_loss=0.5)
    assert s.n_fake == 1 and s.n_real == 1
    assert abs(s.score - (s.mean_soft_dice - 10 * s.mean_fpr)) < 1e-9
    assert s.mean_fpr == 0.0
    assert s.mean_soft_dice > 0.9


def test_aggregator_requires_real_and_fake():
    agg = MetricsAggregator()
    gt_f = np.zeros((4, 4), np.float32); gt_f[0, 0] = 1
    agg.add(_case(np.zeros((4, 4), np.float32), gt_f))
    with pytest.raises(ValueError, match="no real images"):
        agg.summarize(1)
    agg2 = MetricsAggregator()
    agg2.add(_case(np.zeros((4, 4), np.float32), np.zeros((4, 4), np.float32)))
    with pytest.raises(ValueError, match="fake"):
        agg2.summarize(1)


def test_csv_schema(tmp_path):
    d = str(tmp_path)
    agg = MetricsAggregator()
    gt_f = np.zeros((4, 4), np.float32); gt_f[:2, :2] = 1
    agg.add(_case(np.where(gt_f > 0, 0.9, 0.1).astype(np.float32), gt_f))
    agg.add(_case(np.zeros((4, 4), np.float32), np.zeros((4, 4), np.float32)))
    s = agg.summarize(epoch=3, mean_train_loss=0.7)
    with CSVHandler(d) as h:
        h.write_epoch(s)
    names = sorted(os.listdir(d))
    assert names == sorted([
        "lr_range_test.csv", "batch_test_file.csv", "val_metric_all_epoch.csv",
        "val_metric_real_epoch.csv", "val_metric_fake_epoch.csv",
        "val_metric_real_batch.csv", "val_metric_fake_batch.csv",
    ])
    with open(os.path.join(d, "val_metric_all_epoch.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["epoch", "mean_accuracy", "mean_val_loss",
                       "mean_train_loss", "mean_confusion_matrix_bin",
                       "mean_confusion_matrix_soft", "Score"]
    assert rows[1][0] == "3"
    # Score column parses as float (what run.py ranks on)
    assert abs(float(rows[1][6]) - s.score) < 1e-9
    with open(os.path.join(d, "val_metric_fake_epoch.csv")) as f:
        frows = list(csv.reader(f))
    assert len(frows[0]) == 13

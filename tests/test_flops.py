"""Analytic FLOP model sanity (utils/flops.py).

The estimator exists because XLA cost_analysis undercounts once Pallas
kernels hide their matmuls; its anchor is the r2 XLA-path measurement
of the full train step (1.526 TFLOP/img at 512^2, BASELINE.md).
"""

from semantic_segmentation_of_stylegan2_artifacts_tpu.utils.flops import (
    train_step_flops,
)


def test_matches_r2_xla_cost_anchor():
    per_img = train_step_flops(512, 1) / 1e12
    assert abs(per_img - 1.526) / 1.526 < 0.15, per_img


def test_scales_with_batch_and_resolution():
    one = train_step_flops(512, 1)
    eight = train_step_flops(512, 8)
    # AdamW's per-param term doesn't scale with batch
    assert 7.5 * one < eight < 8.0 * one
    big = train_step_flops(1024, 1)
    assert 3.5 * one < big < 4.5 * one  # ~4x tokens, same params


def test_custom_architecture_shrinks():
    tiny = train_step_flops(64, 1, embed_dim=32, depths=(2, 2, 2, 2),
                            params=1_000_000)
    assert tiny < train_step_flops(512, 1) / 100

"""Benchmark: MS-UNet (Swin-B) train-step throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Headline workload (BASELINE.md): 512x512 training images/sec/chip on the
full 52-block Swin-B MS-UNet, batch from --batch (default 8; the reference
trains at batch 2 on GPU — on TPU larger batches amortize host overheads
and fill the MXU; images/sec is comparable either way), bf16 compute,
full train step (forward + DynamicLoss + backward + AdamW update) with
donated buffers and on-device synthetic uint8 data (isolates the compute
path, as the reference's GPU-side hot loop does after H2D).

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
denominator is a documented engineering estimate of the PyTorch fp16
reference on one A100 at 512^2 (REFERENCE_GPU_IPS below). The driver's
target is >=5x.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from semantic_segmentation_of_stylegan2_artifacts_tpu.utils.platform import (
    apply_platform_override,
)

# honors SSA_TPU_PLATFORM=cpu (CPU smoke runs while the TPU relay is
# down) and sets up the persistent compilation cache
apply_platform_override()

# Estimated PyTorch-reference throughput (images/sec) at 512x512 fwd+bwd,
# fp16 AMP, single A100-class GPU, for this 52-block Swin-B MS-UNet.
# The reference repo publishes no measurements (BASELINE.md); this anchor
# makes vs_baseline = measured / REFERENCE_GPU_IPS, target >= 5.
REFERENCE_GPU_IPS = 25.0

# TPU v5e (v5 lite) bf16 peak, for the MFU line: 197 TFLOP/s per chip.
PEAK_BF16_FLOPS = 197e12


def _pallas_cfg(args):
    """Fused attention on; wide stages to XLA at 1024^2+ (BASELINE.md)."""
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models.msunet import (
        _pallas_stages,
    )

    return _pallas_stages(not args.no_pallas_attn, args.img,
                          patch=4, n_stages=4, window=7)


def _dispatch_floor_ms(n: int = 50) -> float:
    """Per-dispatch overhead of the backend, in ms.

    Chains ``n`` trivial compiled steps and divides by ``n``: on a local
    backend this is ~0.1 ms; over a healthy axon relay ~2-3 ms; a
    degraded relay reads 5+ ms (r3 outage read ~5.5 ms, making step
    timings ~1%% pessimistic at 512^2).  Recorded in the bench JSON so a
    degraded-relay round is self-describing.
    """
    tick = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    x = tick(x)
    float(x[0, 0])  # compile + sync
    t0 = time.time()
    for _ in range(n):
        x = tick(x)
    float(x[0, 0])
    return (time.time() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="small model/size for smoke runs")
    ap.add_argument("--remat", action="store_true",
                    help="enable full rematerialisation")
    ap.add_argument("--remat_mode", default="",
                    choices=["", "none", "full", "dots", "high_res",
                             "high_res_dots"],
                    help="rematerialisation policy sweep knob; default: "
                         "none below 1024^2, dots at 1024^2+")
    ap.add_argument("--window_group", type=int, default=0,
                    help="windows per attention matmul (0 = auto)")
    ap.add_argument("--gelu_exact", action="store_true",
                    help="exact erf GELU (reference parity mode); default "
                         "benchmarks the tanh-GELU deployment config "
                         "(TPU.GELU_TANH, ~2.2x faster on the VPU)")
    ap.add_argument("--no_pallas_attn", action="store_true",
                    help="disable the fused Pallas window-attention kernel "
                         "(TPU.USE_PALLAS_ATTENTION, default on: flash-style "
                         "backward, no saved probs tensors, +16%%)")
    ap.add_argument("--no_fused_patch", action="store_true",
                    help="disable the fused PatchMerging/PatchExpand Pallas "
                         "kernels (TPU.FUSED_PATCH: relayout+LN+Linear in "
                         "one program; default on, +2%% in the r4 A/B)")
    ap.add_argument("--no_fused_head", action="store_true",
                    help="disable the Pallas fused GELU+depth-to-space head "
                         "kernel (TPU.FUSED_HEAD); only active in tanh-GELU "
                         "mode on a TPU backend")
    ap.add_argument("--softmax_f32", action="store_true",
                    help="keep fp32 attention softmax (parity mode); the "
                         "default benchmarks the bf16-softmax deployment "
                         "config (~4%% faster, metric-level equivalent)")
    ap.add_argument("--mode", choices=["train", "infer"], default="train",
                    help="train step throughput (default) or forward-only "
                         "serving throughput")
    args = ap.parse_args()

    from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
        default_config,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.models import MSUNet
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train import (
        create_train_state,
    )
    from semantic_segmentation_of_stylegan2_artifacts_tpu.train.state import (
        make_train_step,
    )

    softmax_dtype = jnp.float32 if args.softmax_f32 else jnp.bfloat16
    if args.quick:
        model = MSUNet(img_size=128, embed_dim=32, depths=(2, 2, 2, 2),
                       num_heads=(2, 2, 4, 4), window_size=7,
                       dtype=jnp.bfloat16, softmax_dtype=softmax_dtype,
                       gelu_tanh=not args.gelu_exact)
        img_size = 128
        batch = 2
        steps, warmup = 5, 2
    else:
        # r2 sweep winners at 1024² (BASELINE.md): none with the mixed
        # kernel (5.35), high_res on the pure XLA path (5.32)
        mode = args.remat_mode
        if not mode:
            if args.remat:
                mode = "full"
            elif args.img >= 1024 and args.no_pallas_attn:
                mode = "high_res"
            else:
                mode = "none"
        use_remat = mode in ("full", "dots")
        policy = "dots" if mode in ("dots", "high_res_dots") else ""
        high_res = mode in ("high_res", "high_res_dots")
        model = MSUNet(img_size=args.img, embed_dim=128,
                       depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                       window_size=7, dtype=jnp.bfloat16,
                       use_remat=use_remat, remat_policy=policy,
                       remat_high_res=high_res,
                       window_group=args.window_group,
                       gelu_tanh=not args.gelu_exact,
                       fused_head=not args.no_fused_head,
                       use_fused_patch=not args.no_fused_patch,
                       use_pallas=_pallas_cfg(args),
                       softmax_dtype=softmax_dtype)
        img_size = args.img
        batch = args.batch
        steps, warmup = args.steps, args.warmup

    config = default_config()
    config.defrost()
    config.DATA.IMG_SIZE = img_size
    config.MODEL.FREEZE_ENCODER = False
    config.freeze()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    t0 = time.time()
    state = create_train_state(
        model, config, jax.random.PRNGKey(0),
        jnp.zeros((1, img_size, img_size, 3), jnp.bfloat16),
    )
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.RandomState(0)
    image = jnp.asarray(
        rng.randint(0, 255, (batch, img_size, img_size, 3), np.uint8)
    )
    label = jnp.asarray(
        (rng.rand(batch, img_size, img_size) > 0.8).astype(np.uint8)
    )
    lr = jnp.asarray(1e-4, jnp.float32)

    if args.mode == "infer":
        from semantic_segmentation_of_stylegan2_artifacts_tpu.train.state import (
            make_predict_step,
        )

        predict = make_predict_step(model)
        t0 = time.time()
        for _ in range(warmup):
            probs = predict(state.params, image)
        float(jnp.sum(probs[..., :1]))
        print(f"compile+warmup: {time.time()-t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        for _ in range(steps):
            probs = predict(state.params, image)
        float(jnp.sum(probs[..., :1]))  # hard host sync (see below)
        dt = time.time() - t0
        ips = batch * steps / dt
        print(json.dumps({
            "metric": f"msunet_swin_b_{img_size}sq_infer_throughput",
            "value": round(ips, 3),
            "unit": "images/sec/chip",
            "vs_baseline": round(ips / (REFERENCE_GPU_IPS * 3.0), 3),
        }))
        return

    step = make_train_step(model, 0.2, 0.8, 0.45, donate=True)

    # FLOPs of the compiled step (for the MFU line); tolerate backends
    # where AOT cost analysis is unavailable (e.g. the axon relay).  The
    # AOT executable replaces the jitted callable so the step compiles
    # exactly once.
    flops_per_step = None
    try:
        compiled = step.lower(state, image, label, lr).compile()
        step = compiled
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            f = float(cost.get("flops", 0.0))
            flops_per_step = f if f > 0 else None
        except Exception as e:  # noqa: BLE001
            print(f"cost_analysis unavailable: {e!r}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"AOT compile unavailable: {e!r}", file=sys.stderr)

    t0 = time.time()
    for _ in range(warmup):
        state, loss = step(state, image, label, lr)
    float(loss)  # hard host sync: block_until_ready is unreliable on the
    # remote-relay backend (returns before the chain drains)
    print(f"compile+warmup: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for _ in range(steps):
        state, loss = step(state, image, label, lr)
    final_loss = float(loss)
    dt = time.time() - t0
    print(f"final loss: {final_loss:.5f}", file=sys.stderr)

    ips = batch * steps / dt
    result = {
        "metric": f"msunet_swin_b_{img_size}sq_train_throughput",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REFERENCE_GPU_IPS, 3),
    }
    # MFU from the analytic FLOP model (utils/flops.py): XLA's
    # cost_analysis cannot see inside tpu_custom_call, so its count
    # shrinks as more of the step moves into Pallas kernels (r4: 0.453
    # vs 1.052 TFLOP/img for the same architecture).  The analytic
    # count is kernel-independent; the cost-based number is kept as an
    # auxiliary field when available.
    if not args.quick:
        from semantic_segmentation_of_stylegan2_artifacts_tpu.utils.flops \
            import train_step_flops

        aflops = train_step_flops(img_size, batch)
        result["mfu"] = round(aflops * steps / dt / PEAK_BF16_FLOPS, 4)
        result["tflops_per_img"] = round(aflops / batch / 1e12, 3)
    if flops_per_step is not None:
        result["xla_cost_tflops_per_img"] = round(
            flops_per_step / batch / 1e12, 3)
    result["dispatch_floor_ms"] = round(_dispatch_floor_ms(), 2)
    print(json.dumps(result))


def _probe_backend(timeout_s: int = 900) -> None:
    """Fail fast (not hang) when the TPU relay is unreachable.

    ``jax.devices()`` against a dead axon relay blocks indefinitely
    (observed: a multi-hour relay outage on 2026-08-18), which would
    hang the driver's bench run with no diagnostic.  Probe backend init
    in a subprocess with a hard timeout instead; on failure, exit
    nonzero with a clear message so the failure is attributable.
    """
    import os
    import subprocess

    if os.environ.get("SSA_TPU_PLATFORM"):  # forced platform: no relay
        return
    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices()"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
    except subprocess.TimeoutExpired:
        print(
            f"bench: TPU backend init did not complete within "
            f"{timeout_s}s — the axon relay is unreachable; aborting "
            f"instead of hanging (set SSA_TPU_PLATFORM=cpu for a CPU "
            f"smoke run)", file=sys.stderr,
        )
        raise SystemExit(3)
    except subprocess.CalledProcessError:
        # init crashed rather than hung: let the real run surface the
        # error (it may be transient; the retry wrapper handles it)
        pass


def _main_with_retry():
    """One retry on transient relay failures, then a safe-config retry.

    The remote TPU compile helper occasionally dies (SIGKILL under its
    own memory cap) or the relay drops a step ("TPU backend error");
    both were observed to succeed on immediate retry (r2).  The driver
    runs this script exactly once per round, so a transient must not
    record a failed benchmark.  If the retry ALSO fails (e.g. a new
    kernel rejected by the remote Mosaic compiler), fall back once more
    with the newest kernels disabled so a number is always recorded.
    """
    _probe_backend()
    try:
        main()
        return
    except Exception as e:  # noqa: BLE001
        print(f"bench attempt 1 failed ({type(e).__name__}: {e}); "
              f"retrying once", file=sys.stderr)
    try:
        main()
        return
    except Exception as e:  # noqa: BLE001
        print(f"bench attempt 2 failed ({type(e).__name__}: {e}); "
              f"retrying with the newest kernels disabled", file=sys.stderr)
    if "--no_fused_patch" not in sys.argv:
        sys.argv.append("--no_fused_patch")
    main()


if __name__ == "__main__":
    _main_with_retry()

"""Headline benchmark: TiTok ViT-B-scale training-step throughput per chip.

Measures the full flagship workload (BASELINE.json north_star): TiTok-B tokenizer
(image 128, patch 16, 256 latent tokens, codebook 2048 — the reference
train_titok.py defaults) full training step including the ConvNeXt-S perceptual loss
(randomly initialized here: identical compute graph; pretrained weights are not
materializable in this environment — see vit_tpu/losses/perceptual.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md). The denominator is a
documented estimate of the reference stack's per-GPU throughput on its era-typical
hardware (RTX 3090/4090-class, PyTorch AMP, unfused attention+VQ):
~35 TFLOP/s effective on a ~220 GFLOP/image workload → ~160 img/s.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

REFERENCE_IMG_PER_S_ESTIMATE = 160.0


def main():
    from vit_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--bs", type=int, default=64)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--no_perceptual", action="store_true")
    parser.add_argument("--perceptual_quant", type=str, default=None,
                        choices=[None, "int8"],
                        help="int8: frozen perceptual net on the int8 MXU "
                             "path (2x bf16 peak, VERDICT r3 next #1)")
    parser.add_argument("--scan_layers", action="store_true",
                        help="lax.scan over transformer blocks (compile-time "
                             "lever; A/B the step-time cost here). Implies "
                             "remat: the scan backward's saved per-iteration "
                             "intermediates exceed HBM at this batch size "
                             "(measured 21.5G > 15.75G without it)")
    parser.add_argument("--remat", action="store_true",
                        help="per-block jax.checkpoint WITHOUT scan (pair with "
                             "VIT_TPU_REMAT_POLICY=dots to A/B saving only dot "
                             "outputs in the unrolled graph: drops the 126 MB "
                             "gelu(h) AD residual per MLP, bwd recomputes "
                             "elementwise only)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of 3 timed steps here")
    args = parser.parse_args()

    from vit_tpu.losses.perceptual import PerceptualLoss
    from vit_tpu.models.titok import TiTok, TiTokConfig
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState
    from vit_tpu.train.step import make_tokenizer_train_step

    config = TiTokConfig(image_size=128, patch_size=16, latent_tokens=256,
                         codebook_size=2048, latent_dim=12, transformer="B",
                         scan_layers=args.scan_layers,
                         remat=args.scan_layers or args.remat)
    model = TiTok(config)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (args.bs, 128, 128, 3), jnp.float32)
    params = jax.jit(model.init)(rng, images[:1])["params"]

    perceptual = None
    if not args.no_perceptual:
        perceptual = PerceptualLoss(PerceptualLoss.init_params(),
                                    dtype=jnp.bfloat16,
                                    quant=args.perceptual_quant or "none")

    tx = make_optimizer(1e-4, 5000, 1_000_000, 1e-5, 1e-4, clip_norm=1.0)
    state = TrainState.create(params, tx)
    usage = jnp.zeros((config.codebook_size,), jnp.float32)

    step = jax.jit(
        make_tokenizer_train_step(model, perceptual_loss_fn=perceptual,
                                  perceptual_weight=1.0),
        donate_argnums=(0, 2),
    )

    # XLA's FLOP count for the step (for MFU); must run before the timing loop
    # because state/usage buffers are donated.
    step_flops = 0.0
    try:
        cost = step.lower(state, images, usage, rng).compile().cost_analysis()
        step_flops = float((cost or {}).get("flops", 0.0))
    except Exception:
        pass

    # NOTE: on this platform block_until_ready can ack dispatch before execution
    # completes; jax.device_get of a value chained through every step is the
    # reliable completion barrier.
    for _ in range(args.warmup):
        state, usage, metrics, _ = step(state, images, usage, rng)
    float(jax.device_get(metrics["train/loss"]))

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
        for _ in range(3):
            state, usage, metrics, _ = step(state, images, usage, rng)
        float(jax.device_get(metrics["train/loss"]))
        jax.profiler.stop_trace()

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, usage, metrics, _ = step(state, images, usage, rng)
    float(jax.device_get(metrics["train/loss"]))
    dt = time.perf_counter() - t0

    img_per_s = args.bs * args.steps / dt

    # MFU: XLA's own FLOP count for the compiled step / measured time / peak.
    # Peak = 197 TF/s (v5e bf16 spec). Round-5 correction: this chip is
    # near-spec (in-step GEMM fusions sustain ~189 TF/s per xprof) — the old
    # "130 TF/s derated tunnel chip" reading was a dispatch-overhead
    # measurement artifact (BENCHMARKS.md round-5).
    mfu = (step_flops * args.steps / dt / 197e12) if step_flops else None

    out = {
        "metric": "titok_b_train_images_per_sec_per_chip",
        "value": round(img_per_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_s / REFERENCE_IMG_PER_S_ESTIMATE, 3),
    }
    if mfu is not None:
        out["mfu_vs_v5e_peak"] = round(mfu, 4)
    if step_flops:
        # Perf-contract accounting. ROUND-5 ENVELOPE CORRECTION
        # (BENCHMARKS.md "round-5 measurement methodology correction"): the
        # old "130 TF/s measured envelope" was a dispatch-overhead artifact of
        # per-call benching through the tunnel. Ground truth is the xprof
        # capture of the step itself: XLA GEMM fusions in THIS graph sustain
        # up to ~189 TF/s (96% of the 197 TF/s v5e spec), so this chip is
        # near-spec silicon and the old 1.515x "spec uplift" projection was
        # fiction. The envelope below is SELF-CALIBRATED from the committed
        # per-fusion attribution table (scripts/fusion_table.py artifact) —
        # the 98th-percentile rate the step's own best fusions demonstrate.
        import os

        table_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "benchdata", "fusion_table.json")
        table = None
        if os.path.exists(table_path):
            with open(table_path) as f:
                table = json.load(f)
        envelope_tf = (table or {}).get("gemm_envelope_tf_per_s", 188.6)
        envelope = envelope_tf * 1e12
        out["flops_per_step"] = round(step_flops, 0)
        out["hw_envelope_tflops_measured"] = envelope_tf
        out["mfu_vs_measured_envelope"] = round(
            step_flops * args.steps / dt / envelope, 4)
        out["projected_spec_v5e_img_per_s"] = round(
            img_per_s * 197.0 / envelope_tf, 1)
        # All-FLOPs-at-envelope bound (not reachable: attention is lane-
        # limited to envelope/2 at K=64 and the dwconv/stream work has its own
        # floors — see per_class_floor below for the honest bound).
        sol = args.bs / (step_flops / envelope)
        need = 3 * REFERENCE_IMG_PER_S_ESTIMATE * envelope_tf / 197.0
        gap = {
            "target_img_per_s": round(3 * REFERENCE_IMG_PER_S_ESTIMATE, 1),
            "speed_of_light_this_chip_img_per_s": round(sol, 1),
            "needed_on_this_chip_for_3x_on_spec_img_per_s": round(need, 1),
            "ms_per_step_cut_needed": round(
                max(0.0, (args.bs / img_per_s - args.bs / need)) * 1e3, 1),
        }
        if table:
            # COMPUTED from the xprof per-fusion table (VERDICT r4 next #1):
            # pool = ms x (1 - achieved/envelope) per straggler group; floor =
            # every GEMM at the envelope, attention at its K=64 lane ceiling,
            # VPU/stream categories at their measured (round-4-closed) floors.
            gap["open_software_pools_ms_per_step"] = \
                table["open_pools_ms_per_step"]
            gap["pools_captured_at"] = {
                "git": table.get("git"), "note": table.get("note")}
            floor_ms = 0.0
            for e in table["entries"]:
                if e["cls"] == "gemm":
                    floor_ms += e["ms_per_step"] * e["tf_per_s"] / envelope_tf
                elif e["cls"] == "attention":
                    floor_ms += e["ms_per_step"] * e["tf_per_s"] \
                        / (envelope_tf / 2.0)
                else:
                    floor_ms += e["ms_per_step"]
            floor_ms += table["total_device_ms_per_step"] - sum(
                e["ms_per_step"] for e in table["entries"])
            gap["per_class_floor_ms_per_step"] = round(floor_ms, 1)
            gap["floor_img_per_s_on_spec_v5e"] = round(
                args.bs / floor_ms * 1e3 * 197.0 / envelope_tf, 1)
            # the checkable verdict: if even the floor projects below 3x on
            # spec silicon, the contract is infeasible at this workload
            gap["three_x_feasible_at_this_workload"] = bool(
                gap["floor_img_per_s_on_spec_v5e"] >= 3 * REFERENCE_IMG_PER_S_ESTIMATE)
        out["gap_to_3x"] = gap
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Shared tokenizer training loop.

The reference repeats this loop in four scripts (train_titok.py:143-179,
train_vit_vqgan.py:140-176, train_enhancing_vitvqgan.py:322-357, and the TATiTok
variant); here it exists once. Loop shape: per-step jitted train step with on-device
codebook-usage bitmap; every ``log_every`` steps flush metrics + best-recon checkpoint;
every ``image_every`` steps log input/recon grids and reset the usage bitmap.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

from vit_tpu.data.resume import resume_stream, set_stream_epoch
from vit_tpu.train.checkpoint import Checkpointer
from vit_tpu.train.distributed import is_addressable, maybe_mesh_runner
from vit_tpu.train.optim import make_optimizer
from vit_tpu.train.state import TrainState, params_str
from vit_tpu.train.step import make_tokenizer_train_step
from vit_tpu.utils.logging import MetricsLogger


def build_perceptual(args, dtype):
    spec = getattr(args, "perceptual_weights", None)
    if not spec:
        return None
    from vit_tpu.losses.perceptual import PerceptualLoss

    # --perceptual_quant int8: the frozen net's GEMMs on the int8 MXU path
    # (2× bf16 peak); loss semantics unchanged (see losses/perceptual.py)
    quant = getattr(args, "perceptual_quant", None) or "none"
    params = (PerceptualLoss.init_params() if spec == "random"
              else PerceptualLoss.load_params(spec))
    return PerceptualLoss(params, dtype=dtype, quant=quant)


def run_tokenizer_training(args, model, model_config, train_loader, *,
                           project_name: str, run_name: str,
                           codebook_size: int, pixel_loss: str,
                           perceptual_weight: Optional[float] = None):
    """Generic tokenizer loop. ``args`` must carry the reference CLI fields
    (lr, warmup_steps, train_steps, min_lr, weight_decay, epochs, ...)."""
    dtype = jnp.bfloat16 if args.mixed else jnp.float32
    runner = maybe_mesh_runner(args)  # --mesh dp,fsdp,tp; None = single device
    logger = MetricsLogger(project_name, run_name, config=vars(args),
                           out_dir=getattr(args, "run_dir", None),
                           use_wandb=not args.no_wandb)

    rng = jax.random.PRNGKey(args.seed)
    init_images = jnp.zeros((1, args.image_size, args.image_size, 3))
    params = jax.jit(model.init)(rng, init_images)["params"]

    perceptual = build_perceptual(args, dtype)
    tx = make_optimizer(args.lr, args.warmup_steps, args.train_steps, args.min_lr,
                        args.weight_decay, clip_norm=1.0,
                        mu_dtype=getattr(args, "adam_mu_dtype", None)
                        or "bfloat16")
    state = TrainState.create(params, tx,
                              ema_decay=getattr(args, "ema_decay", 0.0))

    ckpt = Checkpointer(args.ckpt_dir, mode="min")
    start_epoch, skip0 = 0, 0
    if getattr(args, "resume", False) and ckpt.can_restore():
        state = ckpt.restore(state)
        print(f"RESUMED at step {int(state.step)}")
        # restore the input-stream position too (vit_tpu/data/resume.py):
        # the resumed run continues the batch sequence instead of re-reading
        # the dataset from the top
        data_rs = ckpt.load_data_state(int(state.step))
        if data_rs:
            start_epoch, skip0 = int(data_rs["epoch"]), int(data_rs["next_batch"])
            set_stream_epoch(train_loader, start_epoch)
            print(f"RESUMED data stream at epoch {start_epoch}, "
                  f"batch {skip0}")

    mk_kwargs = dict(
        perceptual_loss_fn=perceptual,
        perceptual_weight=(perceptual_weight if perceptual_weight is not None
                           else getattr(args, "perceptual_weight", 1.0)),
        pixel_loss=pixel_loss)
    step_fn = make_tokenizer_train_step(model, **mk_kwargs)
    # --watch histograms are only CONSUMED at log points, so they ride a
    # second step variant invoked on log steps only — off-log steps pay zero
    # histogram work (the reference's wandb.watch also computes at log_freq).
    watch = bool(getattr(args, "watch", False))
    step_fn_watch = (make_tokenizer_train_step(model, watch=True, **mk_kwargs)
                     if watch else None)
    if runner is not None:
        # dp/fsdp/tp: state sharded per parallel/sharding.py rules, batch over
        # the "data" axis; XLA inserts the grad-psum / param-all-gather
        # collectives (the reference has no multi-device path at all, SURVEY §2c)
        state, st_sh = runner.shard_state(state)
        rng = runner.put_rep(rng)

        def _jit(fn):
            return runner.jit_step(
                fn,
                in_specs=(st_sh, "batch", "rep", "rep"),
                out_specs=(st_sh, "rep", "rep", "batch"),
                donate_argnums=(0, 2))

        train_step = _jit(step_fn)
        train_step_watch = _jit(step_fn_watch) if watch else None
    else:
        train_step = jax.jit(step_fn, donate_argnums=(0, 2))
        train_step_watch = (jax.jit(step_fn_watch, donate_argnums=(0, 2))
                            if watch else None)

    print(f"STATS: enc_params={params_str(state.params)}")

    # Profiling (SURVEY.md §5): the reference only wall-clocks step/load time; here a
    # jax.profiler trace of steps 10..15 can be captured to --profile_dir or
    # $VIT_TPU_PROFILE_DIR (view with tensorboard / xprof).
    import os

    profile_dir = (getattr(args, "profile_dir", None)
                   or os.environ.get("VIT_TPU_PROFILE_DIR"))

    # Checkpoint cadence is decoupled from log cadence: a full orbax save moves
    # the whole train state (params + 2 AdamW moments, GBs at flagship scale)
    # device→host synchronously — on a slow host link that dwarfs the step
    # itself if done every log_every (measured: ~10 s/step wall at 0.44 s
    # step_time on the flagship). The disk write itself is async
    # (Checkpointer.save); best-metric gating still happens at ckpt points.
    ckpt_every = getattr(args, "ckpt_every", None) or 250
    last_ckpt_step = None

    usage = jnp.zeros((codebook_size,), jnp.float32)
    if runner is not None:
        usage = runner.put_rep(usage)
    is_proc0 = jax.process_index() == 0
    global_i = 0
    prev_loss = None
    # Device prefetch: issue batch N+1's host->device transfer before batch N
    # is consumed so the DMA overlaps the previous step's compute (the
    # transfer is the step-time gap vs bench.py's on-device data on hosts
    # with a slow device link — see vit_tpu/data/prefetch.py).
    from vit_tpu.data.prefetch import device_prefetch
    from vit_tpu.train.preempt import GracefulShutdown

    shutdown = GracefulShutdown.install()

    put = (runner.put_batch if runner is not None else jnp.asarray)
    for epoch in range(start_epoch, args.epochs):
        skip = skip0 if epoch == start_epoch else 0
        st = time.time()
        # --max_epoch_steps caps batches per epoch for ANY loader (0 = full
        # loader): smoke/e2e runs over real-data loaders with huge virtual
        # epochs (ImagesFromVideoDataset's reference 1000× length), and the
        # explicit per-epoch equalizer for multihost streaming datasets whose
        # shards hold uneven sample counts (data/wds.py:StreamingWebDataset).
        stream = resume_stream(train_loader, skip)
        cap = getattr(args, "max_epoch_steps", 0) or 0
        if cap:
            import itertools

            # resume_stream already consumed `skip` batches of this epoch:
            # the cap bounds the EPOCH, not the remainder, so a resumed epoch
            # gets cap - skip more batches (not skip + cap total).
            stream = itertools.islice(stream, max(0, cap - skip))
        for i, (images, _) in enumerate(
                device_prefetch(stream,
                                lambda b: (put(b[0]), b[1])), start=skip):
            if profile_dir and global_i == 10:
                jax.profiler.start_trace(profile_dir)
            load_time = time.time() - st
            is_log = i % args.log_every == 0
            rebased = is_log and prev_loss is not None
            if rebased:
                # Drain the async-dispatch backlog BEFORE timing: between log
                # steps the host races ahead of the device, so "time around the
                # fetch" otherwise measures up to log_every queued steps, not
                # one (observed 2.4 s "step_time" for a 0.25 s step).
                float(jax.device_get(prev_loss))
                st = time.time()
            fn = (train_step_watch
                  if (train_step_watch is not None and is_log) else train_step)
            state, usage, metrics, recon = fn(state, images, usage, rng)
            prev_loss = metrics["train/loss"]
            if profile_dir and global_i == 15:
                jax.block_until_ready(recon)
                jax.profiler.stop_trace()
                print(f"PROFILE: trace for steps 10-15 written to {profile_dir}")
            global_i += 1
            if is_log:
                # metrics are replicated → device_get is multi-host-safe.
                # ONE device_get for the whole tree: per-scalar fetches are
                # each a host<->device round-trip (~tens of ms through a
                # tunnel), and they land inside the step_time window
                # (measured: ~0.2 s of the flagship's 0.43 s "step_time" was
                # 8 sequential scalar fetches; bench.py's 0.245 s is the true
                # step).
                fetched, step_now = jax.device_get((metrics, state.step))
                hists = fetched.pop("_hists", None)
                if hists is not None and is_proc0:
                    logger.log_histograms(hists, step=int(step_now))
                host = {k: float(v) for k, v in fetched.items()}
                step_time = time.time() - st - (0.0 if rebased else load_time)
                # after device_get: the fetch is the only reliable completion
                # barrier on this platform
                host.update({"train/epoch": epoch,
                             "benchmark/load_time": load_time,
                             "benchmark/step_time": step_time})
                if is_proc0:
                    logger.log(host, step=int(step_now))
                    print(f"e={epoch} i={i} loss={host['train/loss']:.3f} "
                          f"recon={host['train/recon_loss']:.3f} "
                          f"quant={host['train/quant_loss']:.3f} "
                          f"usage={host['train/codebook_usage']:.3f} "
                          f"step_time={step_time:.3f}")
                # ckpt saves are collective (all processes call into orbax;
                # Checkpointer serializes the host-side bookkeeping to proc 0).
                # Interval-gated: first log point, then every ckpt_every steps.
                if (last_ckpt_step is None
                        or global_i - last_ckpt_step >= ckpt_every):
                    ckpt.save_if_best(state, host["train/recon_loss"],
                                      config=model_config)
                    # rolling "last" checkpoint: crash recovery via --resume
                    # (the reference loses the run on crash, SURVEY.md §5)
                    ckpt.save(state, config=model_config, tag="last")
                    ckpt.save_data_state(int(step_now),
                                         {"epoch": epoch, "next_batch": i + 1})
                    last_ckpt_step = global_i
            if i % args.image_every == 0:
                if is_proc0 and is_addressable(recon):
                    img4 = jax.device_get(images[:4])
                    rec4 = jax.device_get(recon[:4])
                    logger.log_images(
                        {"images": img4, "reconstructions": rec4},
                        step=int(jax.device_get(state.step)))
                    if min(img4.shape[1:3]) >= 11:  # SSIM 11x11 window
                        from vit_tpu.utils.metrics import ssim

                        s = jax.device_get(ssim(
                            jnp.clip(jnp.asarray(rec4), 0.0, 1.0),
                            jnp.clip(jnp.asarray(img4), 0.0, 1.0))).mean()
                        logger.log({"train/ssim": float(s)},
                                   step=int(jax.device_get(state.step)))
                # periodic per-layer param norms (the wandb.watch-equivalent,
                # reference train_tatitok.py:155; grad_norm is in every step's
                # metrics already)
                from vit_tpu.utils.metrics import tree_norms

                norms = jax.jit(lambda p: tree_norms(p, "param_norm"))(
                    state.params)
                if is_proc0:
                    logger.log({k: float(v) for k, v in
                                jax.device_get(norms).items()},
                               step=int(jax.device_get(state.step)))
                usage = usage * 0.0
            st = time.time()
            if shutdown.requested:
                # SIGTERM (preemption grace window): persist the exact step
                # and exit cleanly so --resume continues from here.
                step_final = int(jax.device_get(state.step))
                print(f"PREEMPTED: saving 'last' at step {step_final} "
                      "and exiting")
                ckpt.save(state, config=model_config, tag="last")
                ckpt.save_data_state(step_final,
                                     {"epoch": epoch, "next_batch": i + 1})
                ckpt.finalize()
                logger.close()
                return state

    # final state is always recoverable regardless of where the interval fell
    ckpt.save(state, config=model_config, tag="last")
    ckpt.save_data_state(int(jax.device_get(state.step)),
                         {"epoch": args.epochs, "next_batch": 0})
    ckpt.finalize()
    logger.close()
    return state

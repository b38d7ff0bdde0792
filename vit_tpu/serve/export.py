"""Serving export: freeze a trained model into portable serialized
executables (StableHLO via ``jax.export``).

The reference has no deployment story — its checkpoints are torch
``state_dict`` blobs that require the full training code to run. Here a
trained checkpoint (train_titok.py / train_vit.py / Checkpointer layout)
exports to self-contained artifacts:

  tokenizers (``export_tokenizer``; titok / vit_vqgan / enhancing / tatitok /
  llamagen_titok — the last consumes VQ code ids instead of images):
    encode.jaxexport   images  (B, H, W, 3) f32 → code indices (B, N) i32
    decode.jaxexport   indices (B, N) i32      → images (B, H, W, 3) f32
  classifiers (``export_classifier``):
    predict.jaxexport  images  (B, H, W, 3) f32 → logits (B, num_classes) f32
  AR priors (``export_videogpt``):
    generate.jaxexport conditioning code ids (B, C) i32 → rollout (B, C+N) i32

plus a ``manifest.json`` recording shapes, codebook size, and the lowering
platforms. A server deserializes them with ``load_exported`` and calls them —
no model code, no flax, no checkpoint restore on the serving path
(``vit_tpu.serve.server`` is a ready-made HTTP front end).

Weights are exported as ARGUMENTS (saved to ``weights.npz`` beside the
executables), not baked into the module as constants: serializing a
flagship-scale (172M-param) constant pool into StableHLO measured tens of
minutes and GB-scale artifacts, while the params-as-args module is KB-scale
and traces in seconds. ``load_exported`` loads the weights and returns
closures, so callers still see plain ``images -> indices`` functions.

Batch size is fixed per export (record several if needed); attention defaults
to the XLA path so one artifact can carry multiple lowering platforms (a
Pallas custom-call would pin it to TPU — pass platforms=("tpu",) and
attn_impl="pallas" for a TPU-only artifact with the fused kernels).

``dp > 1`` exports a DATA-PARALLEL artifact: the module is lowered over a
dp-device ("data",) mesh (params replicated, batch sharded), so one served
call partitions its batch across dp chips over ICI — multi-chip serving with
zero collectives in the graph. ``load_exported`` rebuilds the mesh from the
serving host's devices automatically. Trace-time needs dp visible devices
(``--dp_host_cpu`` virtualizes them on a CPU host; the artifact still targets
``--platforms``).

CLI: ``python scripts/export_tokenizer.py --ckpt <dir> --out <dir> --bs 8``.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
from jax import export as jex


def export_fn(fn, args_spec, platforms=("cpu", "tpu"), *, dp: int = 1):
    """Export a jittable fn at the given ShapeDtypeStruct spec(s).

    ``dp > 1`` lowers over a dp-device 1-D ``("data",)`` mesh — params
    (``args_spec[0]``) replicated, every other arg sharded on its leading
    axis (scalars replicated), outputs batch-sharded. The export host must
    expose ``dp`` devices of its default backend at trace time (a CPU host
    can virtualize them — ``scripts/export_tokenizer.py --dp_host_cpu``);
    the artifact then requires ``dp`` devices wherever it is served and XLA
    partitions each request's batch across them over ICI.
    """
    if dp <= 1:
        return jex.export(jax.jit(fn), platforms=list(platforms))(*args_spec)
    import os

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devs = jax.devices()
    if len(devs) < dp:
        raise ValueError(
            f"dp={dp} export needs {dp} visible devices at trace time; this "
            f"host exposes {len(devs)} ({jax.default_backend()}). On a "
            "single-device host, trace over virtual CPU devices "
            "(scripts/export_tokenizer.py --dp_host_cpu) — the lowering "
            "platforms are independent of the trace host.")
    mesh = Mesh(np.array(devs[:dp]), ("data",))
    rep = NamedSharding(mesh, PartitionSpec())
    shd = NamedSharding(mesh, PartitionSpec("data"))
    in_sh = (rep,) + tuple(shd if s.ndim else rep for s in args_spec[1:])
    jf = jax.jit(fn, in_shardings=in_sh, out_shardings=shd)
    # custom_partitioning wrappers (the fused VQ lookup's GSPMD rule) register
    # compile-time Python callbacks that jax.export cannot serialize under a
    # sharded jit ("serialization of host_callbacks is not yet implemented");
    # scope the XLA-oracle VQ path over the trace. The XLA lookup partitions
    # under GSPMD natively — same math, tested parity (tests/test_vq.py).
    prev = os.environ.get("VIT_TPU_VQ_IMPL")
    os.environ["VIT_TPU_VQ_IMPL"] = "xla"
    try:
        return jex.export(jf, platforms=list(platforms))(*args_spec)
    finally:
        if prev is None:
            os.environ.pop("VIT_TPU_VQ_IMPL", None)
        else:
            os.environ["VIT_TPU_VQ_IMPL"] = prev


def _check_dp(dp: int, bs: int, attn_impl: str = "xla") -> None:
    if dp < 1:
        raise ValueError(f"dp must be >= 1, got {dp}")
    if dp > 1 and bs == 0:
        raise ValueError(
            "dp > 1 requires a fixed batch size: a symbolic batch dim "
            "cannot be statically sharded across the data mesh")
    if dp > 1 and bs % dp:
        raise ValueError(f"batch size {bs} is not divisible by dp={dp}")
    if dp > 1 and attn_impl == "pallas":
        raise ValueError(
            "dp > 1 requires attn_impl='xla': the Pallas attention's "
            "custom_partitioning GSPMD rule is a compile-time Python "
            "callback, which jax.export cannot serialize under a sharded "
            "jit")


def _batch_dim(bs: int):
    """bs > 0: fixed batch. bs == 0: a symbolic batch dim (jax.export shape
    polymorphism) — the artifact then accepts ANY leading batch size, at the
    cost of one XLA compile per distinct size at serve time. Pallas fast
    paths that need static grids (the fused VQ lookup) auto-fall back to
    their XLA oracle under a symbolic trace (kernels/vq.py)."""
    if bs > 0:
        return bs
    (b,) = jex.symbolic_shape("b")
    return b


def _check_symbolic(bs: int, attn_impl: str) -> None:
    """Reject bs=0 + Pallas up front: Pallas grids need static sizes, and the
    failure otherwise surfaces as an opaque Mosaic shape-poly error mid-trace.
    (The fused VQ lookup auto-falls back under a symbolic trace; explicitly
    requested Pallas attention cannot.) Also reject Pallas exports from a
    non-TPU host: the kernels pick interpret mode off the HOST backend at
    trace time, which would silently bake the (orders-of-magnitude slower)
    interpreter into the TPU artifact."""
    if bs == 0 and attn_impl == "pallas":
        raise ValueError("symbolic batch (--bs 0) requires attn_impl='xla': "
                         "Pallas attention grids need a static batch size")
    if attn_impl == "pallas" and jax.default_backend() != "tpu":
        raise ValueError(
            "attn_impl='pallas' exports must run on a TPU host: on a "
            f"'{jax.default_backend()}' host the kernels trace in interpret "
            "mode and that choice is baked into the artifact")


def _check_quantize(quantize, model: str = "") -> None:
    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported quantize mode: {quantize!r} "
                         "(None or 'int8')")
    if quantize and model == "enhancing":
        raise ValueError(
            "quantize is not supported for the 'enhancing' model: it uses "
            "its own PreNorm/Tanh-FFN transformer stack (reference "
            "train_enhancing_vitvqgan.py:104-169), not the shared core the "
            "int8 path hooks into")


def _quantized_net_params(net_cls, cfg, params, init_input):
    """Build the int8 twin of ``net_cls(cfg)`` and its param tree.

    ``cfg`` must already have ``quant`` set and re-derived; the fp ``params``
    (from the checkpoint) are converted against the quant model's structure —
    kernel → (kernel_q, scale) at each quantized Dense site (core/quant.py).
    """
    import jax.random as jrandom

    from vit_tpu.core.quant import quantize_params

    net_q = net_cls(cfg)
    target = jax.eval_shape(net_q.init, jrandom.PRNGKey(0), init_input)["params"]
    return net_q, quantize_params(target, params)


def _make_codec(net, model: str):
    """(encode, decode) closures for a tokenizer ``net``: images (or, for
    llamagen_titok, frozen-VQ code ids) → indices, indices → reconstruction
    (or code logits). Shared by the export lowering and the quantization
    fidelity probe so both measure the same functions."""
    if model == "tatitok":
        def encode(p, images):
            # encode returns (z_quantized, result_dict); serve the indices
            return net.apply({"params": p}, images,
                             method=net.encode)[1]["min_encoding_indices"]

        def decode(p, indices):
            return net.apply({"params": p}, indices, method=net.decode_tokens)
    else:
        def encode(p, images):
            return net.apply({"params": p}, images, method=net.encode)

        def decode(p, indices):
            return net.apply({"params": p}, indices,
                             method=net.decode_indices)
    return encode, decode


def _quant_fidelity(model: str, cfg, codec_fp, params_fp, codec_q, params_q):
    """Measure the int8 twin against the fp model on a synthetic probe batch.

    Returns manifest fields making the quantization accuracy cost visible at
    deploy time (core/quant.py docstring contract): the encode-index agreement
    rate, plus decode PSNR vs the fp reconstruction (image-output models) or
    the argmax agreement of the code logits (llamagen_titok). Runs on the
    export host's default backend; four bs=2 forwards (fp and int8 encode +
    decode), each a small extra compile at export time.
    """
    import numpy as np

    enc_fp, dec_fp = codec_fp
    enc_q, dec_q = codec_q
    key = jax.random.PRNGKey(0)
    if model == "llamagen_titok":
        probe = jax.random.randint(key, (2, cfg.vq_latent_tokens), 0,
                                   cfg.vq_codebook_size, jnp.int32)
    else:
        probe = jax.random.uniform(
            key, (2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    idx_fp = np.asarray(jax.jit(enc_fp)(params_fp, probe))
    idx_q = np.asarray(jax.jit(enc_q)(params_q, probe))
    out = {"quant_encode_index_agreement":
           round(float((idx_fp == idx_q).mean()), 4)}
    # decode both paths from the SAME (fp) indices: isolates decoder error
    # from encoder index flips already counted above
    dec_in = jnp.asarray(idx_fp)
    o_fp = np.asarray(jax.jit(dec_fp)(params_fp, dec_in), np.float32)
    o_q = np.asarray(jax.jit(dec_q)(params_q, dec_in), np.float32)
    if model == "llamagen_titok":
        out["quant_decode_logit_argmax_agreement"] = round(
            float((o_fp.argmax(-1) == o_q.argmax(-1)).mean()), 4)
    else:
        mse = float(np.mean((o_fp - o_q) ** 2))
        out["quant_decode_psnr_db_vs_fp"] = (
            round(10.0 * np.log10(1.0 / mse), 2) if mse > 0 else float("inf"))
    return out


def _load_config(ckpt_dir: str, tag: str) -> dict:
    return json.loads((Path(ckpt_dir) / f"{tag}_config.json").read_text())


def _restore_params(ckpt_dir: str, tag: str, init_fn, init_args,
                    use_ema: bool = False):
    """Restore a checkpoint's params against an abstract template.

    orbax restores against ShapeDtypeStructs, so the model is never
    initialized or compiled here (flagship init alone is a multi-minute CPU
    compile). The sharding on the template is the concrete local device: the
    checkpoint may have been written on different hardware (e.g. trained on
    TPU, exported on a CPU host) and orbax refuses a sharding-less
    cross-topology restore.

    ``use_ema=True`` returns the EMA weight average (``--ema_decay`` runs)
    instead of the live params; rejected if the checkpoint holds none.
    """
    from vit_tpu.train.checkpoint import Checkpointer, has_ema
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState

    if use_ema and not has_ema(ckpt_dir, tag):
        raise ValueError(
            f"use_ema: checkpoint {ckpt_dir}/{tag} holds no EMA average "
            "(train with --ema_decay to write one)")
    params_abs = jax.eval_shape(init_fn, *init_args)["params"]
    tx = make_optimizer(1e-4, 1, 10, 1e-5, 0.0)
    here = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    state_abs = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=here),
        jax.eval_shape(lambda p: TrainState.create(
            p, tx, ema_decay=1.0 if use_ema else 0.0), params_abs))
    state = Checkpointer(ckpt_dir).restore(state_abs, tag=tag)
    return (state.ema_params if use_ema else state.params), int(state.step)


def _write_artifacts(out_dir: str, exported: dict, params, manifest: dict):
    """Serialize {name: jax.export.Exported} + weights.npz + manifest.json."""
    import numpy as np

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for name, exp in exported.items():
        (out / f"{name}.jaxexport").write_bytes(exp.serialize())
    # params is a nested dict of arrays: store leaves under '/'-joined key
    # paths; load_exported rebuilds the nested dict without any model code
    flat = {"/".join(p.key for p in path): np.asarray(leaf)
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(out / "weights.npz", **flat)
    manifest = dict(manifest, jax_version=jax.__version__,
                    functions=sorted(exported))
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return out


def export_tokenizer(ckpt_dir: str, out_dir: str, *, model: str = "titok",
                     bs: int = 1, tag: str = "best",
                     platforms=("cpu", "tpu"), attn_impl: str = "xla",
                     quantize: "str | None" = None, dp: int = 1,
                     use_ema: bool = False):
    """Export a trained tokenizer checkpoint's encode/decode to ``out_dir``.

    ``quantize="int8"`` exports the transformer-block Dense sites as int8 MXU
    matmuls with dynamic activation quantization (core/quant.py): weights.npz
    shrinks ~4×, at a ~1% per-matmul quantization error. An export-time probe
    records the fidelity in the manifest (``quant_encode_index_agreement``,
    ``quant_decode_psnr_db_vs_fp``) alongside the mode itself. The checkpoint
    stays fp — quantization happens here, once.
    """
    _check_symbolic(bs, attn_impl)
    _check_quantize(quantize, model)
    _check_dp(dp, bs, attn_impl)
    from vit_tpu.utils.config import dataclass_from_dict

    cfg_dict = _load_config(ckpt_dir, tag)
    if model == "titok":
        from vit_tpu.models.titok import TiTok, TiTokConfig

        cfg_cls, net_cls = TiTokConfig, TiTok
    elif model == "vit_vqgan":
        from vit_tpu.models.vit_vqgan import ViTVQGAN, ViTVQGANConfig

        cfg_cls, net_cls = ViTVQGANConfig, ViTVQGAN
    elif model == "enhancing":
        from vit_tpu.models.enhancing_vqgan import (EnhancingViTVQGAN,
                                                    EnhancingVQGANConfig)

        cfg_cls, net_cls = EnhancingVQGANConfig, EnhancingViTVQGAN
    elif model == "tatitok":
        from vit_tpu.models.tatitok import TATiTok, TATiTokConfig

        cfg_cls, net_cls = TATiTokConfig, TATiTok
    elif model == "llamagen_titok":
        from vit_tpu.models.llamagen_titok import (LlamaGenTiTok,
                                                   LlamaGenTiTokConfig)

        cfg_cls, net_cls = LlamaGenTiTokConfig, LlamaGenTiTok
    else:
        raise ValueError(f"unsupported model for export: {model}")

    cfg = dataclass_from_dict(cfg_cls, cfg_dict)
    cfg.attn_impl = attn_impl
    cfg.__post_init__()
    net = net_cls(cfg)
    n_tokens = cfg.latent_tokens if model != "vit_vqgan" else cfg.n_patches

    bdim = _batch_dim(bs)
    if model == "llamagen_titok":
        # token-space tokenizer: consumes frozen-VQGAN code ids, decode emits
        # logits over the VQ codebook (reference train_llamagen_titok.py:69-85)
        init_input = jnp.zeros((1, cfg.vq_latent_tokens), jnp.int32)
        in_spec = jax.ShapeDtypeStruct((bdim, cfg.vq_latent_tokens), jnp.int32)
        input_desc = {"input": "vq_code_ids",
                      "input_shape": [bs, cfg.vq_latent_tokens],
                      "output": "vq_code_logits"}
    else:
        init_input = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        in_spec = jax.ShapeDtypeStruct(
            (bdim, cfg.image_size, cfg.image_size, 3), jnp.float32)
        input_desc = {"input": "images", "image_size": cfg.image_size}

    params, step = _restore_params(ckpt_dir, tag, net.init,
                                   (jax.random.PRNGKey(0), init_input),
                                   use_ema=use_ema)

    fidelity = {}
    if quantize:
        # the checkpoint restores against the fp tree above; the exported
        # executable consumes the int8 twin's tree (kernel_q/scale/bias).
        # replace (not in-place mutation): the fp net below keeps its own cfg
        # for the fidelity probe
        net_fp, params_fp = net, params
        cfg_q = dataclasses.replace(cfg, quant=quantize)
        net, params = _quantized_net_params(net_cls, cfg_q, params, init_input)
        fidelity = _quant_fidelity(model, cfg, _make_codec(net_fp, model),
                                   params_fp, _make_codec(net, model), params)

    if model == "tatitok" and getattr(cfg, "text_guidance", False):
        raise ValueError(
            "text-guided TATiTok export is not supported: decode needs a "
            "(B, ctx, text_dim) guidance tensor per request")

    encode, decode = _make_codec(net, model)

    params_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    enc = export_fn(encode, (params_spec, in_spec), platforms, dp=dp)
    idx_dtype = enc.out_avals[0].dtype
    idx_spec = jax.ShapeDtypeStruct((bdim, n_tokens), idx_dtype)
    dec = export_fn(decode, (params_spec, idx_spec), platforms, dp=dp)

    return _write_artifacts(out_dir, {"encode": enc, "decode": dec}, params, {
        "model": model, "bs": bs, "tag": tag, **input_desc,
        "n_tokens": n_tokens,
        "codebook_size": getattr(cfg, "codebook_size", None),
        "indices_dtype": str(idx_dtype),
        "platforms": list(platforms), "attn_impl": attn_impl, "step": step,
        "quantize": quantize, "dp": dp, "use_ema": use_ema, **fidelity,
    })


def export_classifier(ckpt_dir: str, out_dir: str, *, bs: int = 1,
                      tag: str = "best", platforms=("cpu", "tpu"),
                      attn_impl: str = "xla", num_classes: int | None = None,
                      quantize: "str | None" = None, dp: int = 1,
                      use_ema: bool = False):
    """Export a trained ViT classifier checkpoint (train_vit.py layout) to a
    ``predict.jaxexport`` (images → logits). ``num_classes`` is read off the
    checkpointed head kernel's shape when not given. ``quantize="int8"`` as
    in ``export_tokenizer``."""
    _check_symbolic(bs, attn_impl)
    _check_quantize(quantize)
    _check_dp(dp, bs, attn_impl)
    from vit_tpu.models.vit import ViTClassifier, ViTConfig
    from vit_tpu.utils.config import dataclass_from_dict

    cfg = dataclass_from_dict(ViTConfig, _load_config(ckpt_dir, tag))
    cfg.attn_impl = attn_impl
    cfg.__post_init__()
    if num_classes is None:
        import orbax.checkpoint as ocp

        meta = ocp.StandardCheckpointer().metadata(
            Path(ckpt_dir).absolute() / tag)
        tree = meta.item_metadata.tree  # StepMetadata → {'params': ...}
        num_classes = int(tree["params"]["head"]["kernel"].shape[-1])
    net = ViTClassifier(cfg, num_classes=num_classes)

    params, step = _restore_params(
        ckpt_dir, tag, net.init,
        (jax.random.PRNGKey(0),
         jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels))),
        use_ema=use_ema)

    if quantize:
        cfg_q = dataclasses.replace(cfg, quant=quantize)
        net, params = _quantized_net_params(
            lambda c: ViTClassifier(c, num_classes=num_classes), cfg_q, params,
            jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels)))

    def predict(p, images):
        return net.apply({"params": p}, images, deterministic=True)

    params_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    img_spec = jax.ShapeDtypeStruct(
        (_batch_dim(bs), cfg.image_size, cfg.image_size, cfg.in_channels),
        jnp.float32)
    pred = export_fn(predict, (params_spec, img_spec), platforms, dp=dp)

    return _write_artifacts(out_dir, {"predict": pred}, params, {
        "model": "vit_classifier", "bs": bs, "tag": tag,
        "image_size": cfg.image_size, "num_classes": num_classes,
        "platforms": list(platforms), "attn_impl": attn_impl, "step": step,
        "quantize": quantize, "dp": dp, "use_ema": use_ema,
    })


def export_videogpt(ckpt_dir: str, out_dir: str, *, cond_frames: int = 8,
                    gen_frames: int = 8, bs: int = 1, tag: str = "best",
                    platforms=("cpu", "tpu"), attn_impl: str = "xla",
                    temperature: float = 0.0, top_k: "int | None" = None,
                    quantize: "str | None" = None, dp: int = 1,
                    use_ema: bool = False):
    """Export a trained VideoGPT AR prior (train_videogpt.py layout) to a
    ``generate.jaxexport``: conditioning codes (B, cond_frames*frame_size) i32
    → full rollout (B, (cond_frames+gen_frames)*frame_size) i32.

    The rollout is the KV-cached decode (models/videogpt.py — reference
    semantics train_videogpt.py:56-69, O(n) instead of the reference's
    per-token full re-forward), frozen as one executable with the frame
    counts (and decoding strategy) baked in at export time. Greedy by
    default; ``temperature``/``top_k`` bake stochastic decoding in, in which
    case the artifact takes a SECOND input — a scalar uint32 seed — and
    callers use ``served["generate"](tokens, seed)`` (the single-array HTTP
    server can't serve that form; call the artifact directly).
    """
    _check_symbolic(bs, attn_impl)
    _check_quantize(quantize)
    _check_dp(dp, bs, attn_impl)
    from vit_tpu.models.videogpt import VideoGPT, VideoGPTConfig, generate
    from vit_tpu.utils.config import dataclass_from_dict

    cfg = dataclass_from_dict(VideoGPTConfig, _load_config(ckpt_dir, tag))
    cfg.attn_impl = attn_impl
    cfg.__post_init__()
    net = VideoGPT(cfg)
    cond = cond_frames * cfg.frame_size
    n = gen_frames * cfg.frame_size
    if cond + n > cfg.max_tokens:
        raise ValueError(f"cond+gen = {cond + n} tokens exceeds the model's "
                         f"max_tokens {cfg.max_tokens}")

    params, step = _restore_params(
        ckpt_dir, tag, net.init,
        (jax.random.PRNGKey(0),
         jnp.zeros((1, cond_frames, cfg.frame_size), jnp.int32)),
        use_ema=use_ema)

    if quantize:
        cfg_q = dataclasses.replace(cfg, quant=quantize)
        net, params = _quantized_net_params(
            VideoGPT, cfg_q, params,
            jnp.zeros((1, cond_frames, cfg.frame_size), jnp.int32))

    params_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    tok_spec = jax.ShapeDtypeStruct((_batch_dim(bs), cond), jnp.int32)
    if temperature > 0.0:
        def rollout(p, tokens, seed):
            return generate(net, p, tokens, n, temperature=temperature,
                            top_k=top_k, rng=jax.random.PRNGKey(seed))

        seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)
        gen = export_fn(rollout, (params_spec, tok_spec, seed_spec),
                        platforms, dp=dp)
    else:
        def rollout(p, tokens):
            return generate(net, p, tokens, n)

        gen = export_fn(rollout, (params_spec, tok_spec), platforms,
                        dp=dp)

    return _write_artifacts(out_dir, {"generate": gen}, params, {
        "model": "videogpt", "bs": bs, "tag": tag,
        "input": "code_ids", "input_shape": [bs, cond],
        "frame_size": cfg.frame_size, "codebook_size": cfg.codebook_size,
        "cond_frames": cond_frames, "gen_frames": gen_frames,
        "temperature": temperature, "top_k": top_k,
        "platforms": list(platforms), "attn_impl": attn_impl, "step": step,
        "quantize": quantize, "dp": dp, "use_ema": use_ema,
    })


def load_exported(out_dir: str):
    """Load an export dir → {fn_name: callable, ..., "manifest": dict}.

    One entry per ``*.jaxexport`` file (tokenizers: encode/decode;
    classifiers: predict). Needs no model code: weights.npz is rebuilt into
    the params pytree and closed over the deserialized executables."""
    import numpy as np

    out = Path(out_dir)
    manifest = json.loads((out / "manifest.json").read_text())
    params: dict = {}
    with np.load(out / "weights.npz") as npz:
        for key in npz.files:
            node = params
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(npz[key])

    n_param_avals = len(jax.tree_util.tree_leaves(params))
    dp_state: dict = {}  # nr_devices -> (batch_sharding, replicated, params)

    def _dp_layout(nr: int):
        # dp artifacts: rebuild the ("data",) mesh the module was lowered
        # over and pin params to it replicated, once per artifact dir
        if nr not in dp_state:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            devs = jax.devices()
            if len(devs) < nr:
                raise ValueError(
                    f"artifact was exported for dp={nr} data-parallel "
                    f"devices; this host exposes {len(devs)} "
                    f"({jax.default_backend()})")
            mesh = Mesh(np.array(devs[:nr]), ("data",))
            rep = NamedSharding(mesh, PartitionSpec())
            dp_state[nr] = (NamedSharding(mesh, PartitionSpec("data")), rep,
                            jax.device_put(params, rep))
        return dp_state[nr]

    def make_call(exp):
        # jit the exported call so repeated requests hit the executable cache
        # instead of re-dispatching the module eagerly (measured 4.7x per-call
        # overhead on CPU); symbolic-batch artifacts compile once per distinct
        # request size, exactly as documented
        f = jax.jit(exp.call)
        if exp.nr_devices == 1:
            return lambda *a: f(params, *a)
        shd, rep, params_dp = _dp_layout(exp.nr_devices)

        def call(*a):
            # committed sharded inputs give the jitted module its device
            # context; the batch axis splits across the mesh, scalars (a
            # sampled generate's seed) replicate
            a = [jax.device_put(jnp.asarray(x), shd if jnp.ndim(x) else rep)
                 for x in a]
            return f(params_dp, *a)
        return call

    served = {"manifest": manifest, "_in_avals": {}}
    for f in sorted(out.glob("*.jaxexport")):
        exp = jex.deserialize(f.read_bytes())
        served[f.stem] = make_call(exp)
        # data-arg avals (everything after the flattened params) for
        # servers/warmup; symbolic dims (bs=0) become None. Most fns take one
        # array; a sampled VideoGPT generate also takes a scalar seed.
        served["_in_avals"][f.stem] = [
            (tuple(d if isinstance(d, int) else None for d in a.shape),
             jnp.dtype(a.dtype).name)
            for a in exp.in_avals[n_param_avals:]]
    return served

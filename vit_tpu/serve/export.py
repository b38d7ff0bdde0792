"""Serving export: freeze a trained tokenizer into portable serialized
executables (StableHLO via ``jax.export``).

The reference has no deployment story — its checkpoints are torch
``state_dict`` blobs that require the full training code to run. Here a
trained tokenizer checkpoint (train_titok.py / Checkpointer layout) exports to
two self-contained artifacts:

  encode.jaxexport   images  (B, H, W, 3) f32 → code indices (B, N) i32
  decode.jaxexport   indices (B, N) i32      → images (B, H, W, 3) f32

plus a ``manifest.json`` recording shapes, codebook size, and the lowering
platforms. A server deserializes them with ``load_exported`` and calls them —
no model code, no flax, no checkpoint restore on the serving path.

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

CLI: ``python scripts/export_tokenizer.py --ckpt <dir> --out <dir> --bs 8``.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
from jax import export as jex


def export_fn(fn, args_spec, platforms=("cpu", "tpu")):
    """Export a jittable fn at the given ShapeDtypeStruct spec(s)."""
    return jex.export(jax.jit(fn), platforms=list(platforms))(*args_spec)


def export_tokenizer(ckpt_dir: str, out_dir: str, *, model: str = "titok",
                     bs: int = 1, tag: str = "best",
                     platforms=("cpu", "tpu"), attn_impl: str = "xla"):
    """Export a trained tokenizer checkpoint's encode/decode to ``out_dir``."""
    from vit_tpu.train.checkpoint import Checkpointer
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState
    from vit_tpu.utils.config import dataclass_from_dict

    cfg_dict = json.loads((Path(ckpt_dir) / f"{tag}_config.json").read_text())
    if model == "titok":
        from vit_tpu.models.titok import TiTok, TiTokConfig

        cfg = dataclass_from_dict(TiTokConfig, cfg_dict)
        cfg.attn_impl = attn_impl
        cfg.__post_init__()
        net = TiTok(cfg)
        n_tokens = cfg.latent_tokens
    elif model == "vit_vqgan":
        from vit_tpu.models.vit_vqgan import ViTVQGAN, ViTVQGANConfig

        cfg = dataclass_from_dict(ViTVQGANConfig, cfg_dict)
        cfg.attn_impl = attn_impl
        cfg.__post_init__()
        net = ViTVQGAN(cfg)
        n_tokens = cfg.n_patches
    else:
        raise ValueError(f"unsupported model for export: {model}")

    # abstract template: orbax restores against ShapeDtypeStructs, so the
    # model is never initialized or compiled here (flagship init alone is a
    # multi-minute CPU compile)
    params_abs = jax.eval_shape(
        net.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))["params"]
    tx = make_optimizer(1e-4, 1, 10, 1e-5, 0.0)
    # concrete local sharding on the abstract template: the checkpoint may
    # have been written on different hardware (e.g. trained on TPU, exported
    # on a CPU host) and orbax refuses a sharding-less cross-topology restore
    here = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    state_abs = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=here),
        jax.eval_shape(lambda p: TrainState.create(p, tx), params_abs))
    state = Checkpointer(ckpt_dir).restore(state_abs, tag=tag)
    params = state.params

    def encode(p, images):
        return net.apply({"params": p}, images, method=net.encode)

    def decode(p, indices):
        return net.apply({"params": p}, indices, method=net.decode_indices)

    params_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    img_spec = jax.ShapeDtypeStruct((bs, cfg.image_size, cfg.image_size, 3),
                                    jnp.float32)
    enc = export_fn(encode, (params_spec, img_spec), platforms)
    idx_dtype = enc.out_avals[0].dtype
    idx_spec = jax.ShapeDtypeStruct((bs, n_tokens), idx_dtype)
    dec = export_fn(decode, (params_spec, idx_spec), platforms)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "encode.jaxexport").write_bytes(enc.serialize())
    (out / "decode.jaxexport").write_bytes(dec.serialize())
    import numpy as np

    # params is a nested dict of arrays: store leaves under '/'-joined key
    # paths; load_exported rebuilds the nested dict without any model code
    flat = {"/".join(p.key for p in path): np.asarray(leaf)
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(out / "weights.npz", **flat)
    (out / "manifest.json").write_text(json.dumps({
        "model": model, "bs": bs, "tag": tag,
        "image_size": cfg.image_size, "n_tokens": n_tokens,
        "codebook_size": getattr(cfg, "codebook_size", None),
        "indices_dtype": str(idx_dtype),
        "platforms": list(platforms), "attn_impl": attn_impl,
        "step": int(state.step), "jax_version": jax.__version__,
    }, indent=2))
    return out


def load_exported(out_dir: str):
    """Load an export dir → {"encode": fn, "decode": fn, "manifest": dict}.
    Needs no model code: weights.npz is rebuilt into the params pytree and
    closed over the deserialized executables."""
    import numpy as np

    out = Path(out_dir)
    manifest = json.loads((out / "manifest.json").read_text())
    enc = jex.deserialize((out / "encode.jaxexport").read_bytes())
    dec = jex.deserialize((out / "decode.jaxexport").read_bytes())
    params: dict = {}
    with np.load(out / "weights.npz") as npz:
        for key in npz.files:
            node = params
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(npz[key])
    return {"encode": lambda x: enc.call(params, x),
            "decode": lambda idx: dec.call(params, idx),
            "manifest": manifest}

"""vit_tpu — a TPU-native rebuild of the SnakeOnex/vit-is-all-you-need research stack.

Design: JAX + Flax (linen) for models, Pallas for fused TPU kernels (attention,
vector-quantization lookup), optax for optimization, orbax for checkpointing and a
``jax.sharding.Mesh`` ("data", "fsdp", "model") for multi-chip scaling.

The reference stack is single-GPU PyTorch (see SURVEY.md). This package keeps its
capability surface — models, losses, data pipelines, training-entry CLI flags — while
being architected for TPU: bf16 compute on the MXU, fp32 islands for quantization,
static shapes under jit, XLA collectives instead of hand-rolled comm.

Public API (lazy imports keep `import vit_tpu` light):

    from vit_tpu import TiTok, TiTokConfig, ViT, ViTClassifier, ViTConfig, ...
"""

__version__ = "0.1.0"

_EXPORTS = {
    # models
    "ViT": "vit_tpu.models.vit",
    "ViTClassifier": "vit_tpu.models.vit",
    "ViTConfig": "vit_tpu.models.vit",
    "TiTok": "vit_tpu.models.titok",
    "TiTokConfig": "vit_tpu.models.titok",
    "ViTVQGAN": "vit_tpu.models.vit_vqgan",
    "ViTVQGANConfig": "vit_tpu.models.vit_vqgan",
    "EnhancingViTVQGAN": "vit_tpu.models.enhancing_vqgan",
    "EnhancingVQGANConfig": "vit_tpu.models.enhancing_vqgan",
    "VideoGPT": "vit_tpu.models.videogpt",
    "VideoGPTConfig": "vit_tpu.models.videogpt",
    "LlamaGenTiTok": "vit_tpu.models.llamagen_titok",
    "LlamaGenTiTokConfig": "vit_tpu.models.llamagen_titok",
    "TATiTok": "vit_tpu.models.tatitok",
    "TATiTokConfig": "vit_tpu.models.tatitok",
    "FrozenTokenizer": "vit_tpu.models.pretrained",
    "get_titok_tokenizer": "vit_tpu.models.pretrained",
    "LlamaGenVQ": "vit_tpu.models.llamagen_vq",
    "LlamaGenVQConfig": "vit_tpu.models.llamagen_vq",
    "load_llamagen_vq": "vit_tpu.models.llamagen_vq",
    "MAE": "vit_tpu.models.mae",
    "MAEConfig": "vit_tpu.models.mae",
    "Puzzle": "vit_tpu.models.puzzle",
    "PuzzleConfig": "vit_tpu.models.puzzle",
    # core
    "Transformer": "vit_tpu.core.transformer",
    "TransformerConfig": "vit_tpu.core.config",
    "transformer_configs": "vit_tpu.core.config",
    # quantizers / losses
    "Quantizer": "vit_tpu.quantize.vq",
    "FSQ": "vit_tpu.quantize.vq",
    "BytedanceVectorQuantizer": "vit_tpu.quantize.bytedance_vq",
    "PerceptualLoss": "vit_tpu.losses.perceptual",
    # training
    "TrainState": "vit_tpu.train.state",
    "make_optimizer": "vit_tpu.train.optim",
    "Checkpointer": "vit_tpu.train.checkpoint",
    # data
    "StreamingWebDataset": "vit_tpu.data.wds",
    "streaming_image_loader": "vit_tpu.data.wds",
    "DataLoader": "vit_tpu.data.loader",
    "GrainDataLoader": "vit_tpu.data.grain_loader",
    "make_loader": "vit_tpu.data.grain_loader",
    # kernels (ops-level entry points)
    "flash_attention": "vit_tpu.kernels.attention",
    "flash_attention_packed": "vit_tpu.kernels.attention",
    "fused_ln_matmul": "vit_tpu.kernels.ln_matmul",
    # parallel
    "make_mesh": "vit_tpu.parallel.mesh",
    "init_distributed": "vit_tpu.parallel.mesh",
    # serving
    "export_tokenizer": "vit_tpu.serve.export",
    "export_classifier": "vit_tpu.serve.export",
    "export_videogpt": "vit_tpu.serve.export",
    "load_exported": "vit_tpu.serve.export",
    "make_server": "vit_tpu.serve.server",
}


def __getattr__(name):
    module = _EXPORTS.get(name)
    if module is None:
        raise AttributeError(f"module 'vit_tpu' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(module), name)


def __dir__():
    return sorted(list(_EXPORTS) + ["__version__"])

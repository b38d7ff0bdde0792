"""vit_tpu — a TPU-native rebuild of the SnakeOnex/vit-is-all-you-need research stack.

Design: JAX + Flax (linen) for models, Pallas for fused TPU kernels (attention,
vector-quantization lookup), optax for optimization, orbax for checkpointing and a
``jax.sharding.Mesh`` ("data", "fsdp", "model") for multi-chip scaling.

The reference stack is single-GPU PyTorch (see SURVEY.md). This package keeps its
capability surface — models, losses, data pipelines, training-entry CLI flags — while
being architected for TPU: bf16 compute on the MXU, fp32 islands for quantization,
static shapes under jit, XLA collectives instead of hand-rolled comm.
"""

__version__ = "0.1.0"

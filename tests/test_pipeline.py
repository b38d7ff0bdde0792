"""Pipeline parallelism (pp_stages, vit_tpu/core/transformer.py:_pipeline).

GPipe schedule expressed in pure GSPMD: params carry a leading
(stages, layers_per_stage) shape sharded over the mesh "pipe" axis; the tick
loop is an nn.scan over an nn.vmap of per-stage layer scans; the stage→stage
activation handoff is a jnp.roll on the pipe-sharded axis (XLA lowers it to a
collective-permute). No manual collectives — autodiff/optimizer/checkpoint
paths are unchanged GSPMD. The reference has no distributed backend at all
(SURVEY.md §2c; its one multi-device fossil is the undefined ``gather()`` at
blocks.py:457).

Pins: forward/grad parity vs the scanned stack (any microbatch split must be
exact — the math is microbatch-independent); layout converters cross all
three layouts (unrolled ↔ scan ↔ pipeline); "pipe" sharding specs with the
mesh-sanitize fallback; a pipe×data-sharded forward matches single-device;
the REAL ``train_titok.py --mesh dp,fsdp,tp,pp`` script path trains and
matches single-device losses; batch sizes not divisible by the microbatch
count (init's b=1) fall back to M=1 correctly.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vit_tpu.core.config import TransformerConfig
from vit_tpu.core.transformer import (Transformer, convert_stack_layout,
                                      pipeline_layer_params,
                                      unpipeline_layer_params)

REPO = Path(__file__).resolve().parent.parent


def _cfg(**kw):
    base = dict(n_layers=4, n_heads=4, n_embd=32, block_size=16,
                dtype=jnp.float32, scan_layers=True)
    base.update(kw)
    return TransformerConfig(**base)


def _pair(cfg, x):
    """(scan-layout params, pipeline-layout params)."""
    p_scan = Transformer(cfg).init(jax.random.PRNGKey(0), x)["params"]
    return p_scan, pipeline_layer_params(p_scan, 2)


def test_forward_parity_and_microbatch_invariance():
    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 32))
    p_scan, p_pp = _pair(cfg, x)
    y_scan = Transformer(cfg).apply({"params": p_scan}, x)
    for M in (1, 2, 4, 8):
        pcfg = cfg.replace(pp_stages=2, pp_microbatches=M)
        y_pp = Transformer(pcfg).apply({"params": p_pp}, x)
        np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_pp),
                                   rtol=1e-5, atol=1e-6, err_msg=f"M={M}")


def test_indivisible_batch_falls_back():
    """b % M != 0 (e.g. model.init's b=1) runs one microbatch, still exact."""
    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 32))
    p_scan, p_pp = _pair(cfg, x)
    y_scan = Transformer(cfg).apply({"params": p_scan}, x)
    pcfg = cfg.replace(pp_stages=2, pp_microbatches=2)  # 3 % 2 != 0
    y_pp = Transformer(pcfg).apply({"params": p_pp}, x)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_pp),
                               rtol=1e-5, atol=1e-6)


def test_grad_parity_with_remat():
    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 32))
    p_scan, p_pp = _pair(cfg, x)
    g_scan = jax.grad(lambda p: Transformer(cfg).apply(
        {"params": p}, x).sum())(p_scan)
    pcfg = cfg.replace(pp_stages=2, pp_microbatches=4, remat=True)
    g_pp = unpipeline_layer_params(jax.grad(
        lambda p: Transformer(pcfg).apply({"params": p}, x).sum())(p_pp))
    for a, b in zip(jax.tree_util.tree_leaves(g_scan),
                    jax.tree_util.tree_leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_layout_conversions_cross_all_three():
    cfg = _cfg()
    x = jnp.zeros((1, 16, 32))
    p_scan, p_pp = _pair(cfg, x)
    # pipeline → scan round-trip is exact
    rt = unpipeline_layer_params(p_pp)
    for a, b in zip(jax.tree_util.tree_leaves(p_scan),
                    jax.tree_util.tree_leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # convert_stack_layout: unrolled → pipeline directly
    p_un = convert_stack_layout(p_scan, scan_layers=False)
    assert "layer_0" in p_un
    p_pp2 = convert_stack_layout(p_un, scan_layers=True, pp_stages=2)
    assert p_pp2["layers"]["attn"]["qkv"]["kernel"].shape[:2] == (2, 2)
    # pipeline → unrolled (e.g. export of a pp-trained checkpoint)
    back = convert_stack_layout(p_pp2, scan_layers=False)
    assert "layer_3" in back
    # idempotent when the layout already matches
    assert convert_stack_layout(p_scan, scan_layers=True) is p_scan
    # fresh init in the pipeline layout produces (S, L/S, ...) directly
    pcfg = cfg.replace(pp_stages=2)
    p_fresh = Transformer(pcfg).init(jax.random.PRNGKey(0), x)["params"]
    assert p_fresh["layers"]["mlp"]["fc1"]["kernel"].shape[:2] == (2, 2)


def test_match_stack_layout_and_family_threading():
    """match_stack_layout targets all three layouts (the pretrain→fine-tune
    hand-off works when the fine-tune run uses --mesh ...,pp), and every
    core-stack model family threads pp_stages/pp_microbatches."""
    from vit_tpu.core.transformer import match_stack_layout

    cfg = _cfg()
    x = jnp.zeros((1, 16, 32))
    p_scan, p_pp = _pair(cfg, x)
    p_un = convert_stack_layout(p_scan, scan_layers=False)
    assert match_stack_layout(p_un, p_pp)["layers"]["attn"]["qkv"][
        "kernel"].shape[:2] == (2, 2)
    assert "layer_0" in match_stack_layout(p_pp, p_un)
    assert match_stack_layout(p_pp, p_scan)["layers"]["attn"]["qkv"][
        "kernel"].shape[0] == 4

    from vit_tpu.models.llamagen_titok import LlamaGenTiTokConfig
    from vit_tpu.models.mae import MAEConfig
    from vit_tpu.models.puzzle import PuzzleConfig
    from vit_tpu.models.tatitok import TATiTokConfig
    from vit_tpu.models.titok import TiTokConfig
    from vit_tpu.models.videogpt import VideoGPTConfig
    from vit_tpu.models.vit import ViTConfig
    from vit_tpu.models.vit_vqgan import ViTVQGANConfig

    kw = dict(scan_layers=True, pp_stages=2, pp_microbatches=4)
    assert ViTConfig(32, 3, 8, "S", 1, 0.0, **kw).trans_config.pp_stages == 2
    assert TiTokConfig(32, 8, 16, 64, 12, "S",
                       **kw).enc_vit_config.trans_config.pp_stages == 2
    assert ViTVQGANConfig(32, 8, 64, 12, "S",
                          **kw).enc_vit_config.trans_config.pp_stages == 2
    assert VideoGPTConfig(16, 64, "S", 4, 0.0,
                          **kw).trans_config.pp_microbatches == 4
    assert MAEConfig(32, 3, 8, "S", **kw).enc_config.pp_stages == 2
    assert PuzzleConfig(32, 3, 8, "S", **kw).trans_config.pp_stages == 2
    assert LlamaGenTiTokConfig(
        16, 64, 8, 32, 6, "S", **kw).trans_config.pp_stages == 2
    assert TATiTokConfig(32, 8, 16, 64, 12, "small",
                         **kw).trans_config.pp_stages == 2


def test_videogpt_rollout_under_pp():
    """The in-training generation eval works on a pp-configured VideoGPT: the
    decode path falls back to the scanned stack on reshaped params (identical
    tokens), so --mesh ...,pp training runs don't crash at gen_every."""
    from vit_tpu.models.videogpt import VideoGPT, VideoGPTConfig, generate

    kw = dict(dtype=jnp.float32, scan_layers=True)
    cfg = VideoGPTConfig(4, 16, "S", 4, 0.0, **kw)
    tokens = jnp.zeros((2, 4), jnp.int32)
    pcfg = VideoGPTConfig(4, 16, "S", 4, 0.0, pp_stages=2, pp_microbatches=2,
                          **kw)
    p_scan = VideoGPT(cfg).init(jax.random.PRNGKey(0),
                                jnp.zeros((2, 1, 4), jnp.int32))["params"]
    out_ref = generate(VideoGPT(cfg), p_scan, tokens, 4)
    p_pp = dict(p_scan)
    p_pp["transformer"] = pipeline_layer_params(p_scan["transformer"], 2)
    out_pp = generate(VideoGPT(pcfg), p_pp, tokens, 4)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_pp))


def test_pipe_sharding_specs():
    from vit_tpu.parallel.sharding import _mesh_spec, spec_for

    class Leaf:
        def __init__(self, ndim):
            self.ndim = ndim

    # pipeline layout: stage axis on "pipe", within-stage layer replicated
    assert spec_for("t/layers/attn/qkv/kernel", Leaf(4)) == \
        P("pipe", None, "fsdp", "model")
    assert spec_for("t/layers/mlp/fc2/kernel", Leaf(4)) == \
        P("pipe", None, "model", "fsdp")
    assert spec_for("t/layers/attn/qkv/bias", Leaf(3)) == P("pipe", None, "model")
    # scan layout unchanged
    assert spec_for("t/layers/attn/qkv/kernel", Leaf(3)) == \
        P(None, "fsdp", "model")
    # pipeline params on a mesh WITHOUT a pipe axis: stage axis replicates
    from vit_tpu.parallel.mesh import make_mesh

    if jax.device_count() >= 8:
        mesh3 = make_mesh(dp=2, fsdp=2, tp=2)
        assert _mesh_spec(mesh3, P("pipe", None, "fsdp", "model")) == \
            P(None, None, "fsdp", "model")
        mesh4 = make_mesh(dp=2, fsdp=1, tp=1, pp=4)
        assert dict(mesh4.shape) == {"pipe": 4, "data": 2, "fsdp": 1, "model": 1}
        assert mesh4.axis_names[0] == "pipe"


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_pipeline_matches_single_device():
    from vit_tpu.parallel.mesh import make_mesh
    from vit_tpu.parallel.sharding import params_shardings

    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 32))
    p_scan, p_pp = _pair(cfg, x)
    y_ref = Transformer(cfg).apply({"params": p_scan}, x)

    pcfg = cfg.replace(pp_stages=2, pp_microbatches=4)
    mesh = make_mesh(dp=4, fsdp=1, tp=1, pp=2)
    sh = params_shardings(mesh, p_pp)
    assert sh["layers"]["attn"]["qkv"]["kernel"].spec == \
        P("pipe", None, "fsdp", "model")
    xb = NamedSharding(mesh, P("data"))
    f = jax.jit(lambda p, xx: Transformer(pcfg).apply({"params": p}, xx),
                in_shardings=(sh, xb))
    y = f(jax.device_put(p_pp, sh), jax.device_put(x, xb))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_pipeline_composes_with_fsdp_tp():
    """pp composing with fsdp AND tp in one mesh (1,2,2,2 over 8 devices) —
    the full four-axis product no other test exercises. Forward and grads
    must match the unsharded scan stack."""
    from vit_tpu.parallel.mesh import make_mesh
    from vit_tpu.parallel.sharding import params_shardings

    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 32))
    p_scan, p_pp = _pair(cfg, x)

    def loss_ref(p):
        return jnp.sum(Transformer(cfg).apply({"params": p}, x) ** 2)

    y_ref = Transformer(cfg).apply({"params": p_scan}, x)
    g_ref = jax.grad(loss_ref)(p_scan)

    pcfg = cfg.replace(pp_stages=2, pp_microbatches=2)
    mesh = make_mesh(dp=1, fsdp=2, tp=2, pp=2)
    assert dict(mesh.shape) == {"pipe": 2, "data": 1, "fsdp": 2, "model": 2}
    sh = params_shardings(mesh, p_pp)
    xb = NamedSharding(mesh, P("data"))
    p_dev, x_dev = jax.device_put(p_pp, sh), jax.device_put(x, xb)

    f = jax.jit(lambda p, xx: Transformer(pcfg).apply({"params": p}, xx),
                in_shardings=(sh, xb))
    np.testing.assert_allclose(np.asarray(f(p_dev, x_dev)), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)

    def loss_pp(p):
        return jnp.sum(Transformer(pcfg).apply({"params": p}, x_dev) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp), in_shardings=(sh,))(p_dev)
    g_pp_scan = unpipeline_layer_params(jax.device_get(g_pp))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        g_pp_scan, g_ref)


def test_entry_point_pp_mesh_matches_single_device(tmp_path):
    """The REAL train_titok.py on --mesh 2,1,1,2 (dp×pp over 4 CPU devices)
    matches single-device losses — the users-run-this-path pin for pp."""

    def run(mesh: str, tag: str):
        env = dict(os.environ)
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append("--xla_force_host_platform_device_count=8")
        env["XLA_FLAGS"] = " ".join(flags)
        env["JAX_PLATFORMS"] = "cpu"
        cwd = tmp_path / tag
        cwd.mkdir()
        env["VIT_TPU_RUN_DIR"] = str(cwd / "runs")
        cmd = [sys.executable, str(REPO / "train_titok.py"),
               "--dataset", "synthetic", "--mesh", mesh, "--bs", "8",
               "--image_size", "32", "--patch_size", "8",
               "--latent_tokens", "16", "--codebook_size", "64",
               "--transformer", "S", "--n_layers", "2", "--mixed", "false",
               "--scan_layers", "true", "--attn_impl", "xla",
               "--pp_microbatches", "2",
               "--epochs", "1", "--steps_per_epoch", "3", "--log_every", "1",
               "--image_every", "1000", "--train_steps", "10",
               "--warmup_steps", "2", "--no_wandb",
               "--ckpt_dir", str(cwd / "ckpt")]
        proc = subprocess.run(cmd, env=env, cwd=cwd, capture_output=True,
                              text=True, timeout=900)
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
        jsonl = cwd / "runs" / "titok-synthetic" / "8px_32px_S_16_64.jsonl"
        rows = [json.loads(l) for l in jsonl.read_text().splitlines()]
        return [(r["_step"], r["train/loss"]) for r in rows
                if "train/loss" in r]

    pp = run("2,1,1,2", "pp")
    single = run("1,1,1", "single")
    assert len(pp) == len(single) == 3
    # Tolerance note: the transformer pipeline itself is exact to ~1e-6 (the
    # parity tests above). End-to-end through TiTok, a ~1e-6 reassociation
    # difference in the encoder output can flip a near-tie VQ argmin on the
    # fresh random codebook, moving that latent's quantized vector wholesale
    # (~2e-3 on the loss) — so this test pins the PLUMBING (script flag →
    # mesh → sharded pipelined step → telemetry), not bitwise numerics.
    for (s1, l1), (s0, l0) in zip(pp, single):
        assert s1 == s0
        assert abs(l1 - l0) <= 1e-2 * max(abs(l0), 1.0), \
            f"step {s1}: pp loss {l1} vs single {l0}"


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_pipeline_composes_with_pallas_attention():
    """Fused Pallas attention THROUGH the pipeline: the kernel's
    custom_partitioning must survive the pipe-axis GSPMD lowering (VERDICT r3
    weak #5 — the pp dryrun arm previously forced --attn_impl xla). Forward
    parity vs the unsharded scan stack with XLA attention."""
    from vit_tpu.parallel.mesh import make_mesh
    from vit_tpu.parallel.sharding import params_shardings

    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 32))
    p_scan, p_pp = _pair(cfg, x)
    y_ref = Transformer(cfg).apply({"params": p_scan}, x)

    pcfg = cfg.replace(pp_stages=2, pp_microbatches=2, attn_impl="pallas")
    mesh = make_mesh(dp=4, fsdp=1, tp=1, pp=2)
    sh = params_shardings(mesh, p_pp)
    xb = NamedSharding(mesh, P("data"))
    f = jax.jit(lambda p, xx: Transformer(pcfg).apply({"params": p}, xx),
                in_shardings=(sh, xb))
    y = f(jax.device_put(p_pp, sh), jax.device_put(x, xb))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)

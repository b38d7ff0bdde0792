"""MAE + Puzzle pretraining (reference README.md:8-9 checklist papers, no reference
code — SURVEY.md records the absence; these are rebuild-original model families).

Covers: static-shape masking invariants, patchify/unpatchify round-trip, forward
shapes, loss descent on tiny configs, mask determinism per seed, and the
fine-tuning hand-offs into ViTClassifier (MAE encoder / full Puzzle ViT)."""

import os
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_tpu.models.mae import (MAE, MAEConfig, load_encoder_into_vit, mae_loss,
                                patchify, random_masking, unpatchify)
from vit_tpu.models.puzzle import (Puzzle, PuzzleConfig, load_puzzle_into_vit,
                                   puzzle_loss)
from vit_tpu.models.vit import ViTClassifier, ViTConfig
from vit_tpu.train.state import TrainState
from vit_tpu.train.step import (make_mae_train_step, make_puzzle_train_step)


def tiny_mae_config(**kw):
    kw.setdefault("image_size", 32)
    kw.setdefault("patch_size", 8)
    kw.setdefault("transformer", "S")
    kw.setdefault("decoder_layers", 2)
    kw.setdefault("decoder_heads", 4)
    kw.setdefault("decoder_embd", 64)
    kw.setdefault("dtype", jnp.float32)
    return MAEConfig(**kw)


def init_model(model, images, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    return model.init({"params": k1, "mask": k2, "dropout": k3}, images)["params"]


class TestMasking:
    def test_counts_and_inverse(self):
        rng = jax.random.PRNGKey(0)
        b, n, keep = 4, 16, 5
        ids_keep, ids_restore, mask = random_masking(rng, b, n, keep)
        assert ids_keep.shape == (b, keep)
        assert mask.shape == (b, n)
        # exactly n-keep masked per image
        np.testing.assert_array_equal(np.asarray(mask.sum(1)), (n - keep) * np.ones(b))
        # kept indices are exactly the zeros of the mask
        for i in range(b):
            kept = set(np.asarray(ids_keep[i]).tolist())
            zeros = set(np.flatnonzero(np.asarray(mask[i]) == 0).tolist())
            assert kept == zeros
        # ids_restore inverts the shuffle: scattering [kept ++ masked] restores order
        shuffled = jnp.take_along_axis(
            jnp.broadcast_to(jnp.arange(n)[None], (b, n)),
            jnp.argsort(jax.random.uniform(rng, (b, n)), axis=1), axis=1)
        restored = jnp.take_along_axis(shuffled, ids_restore, axis=1)
        np.testing.assert_array_equal(np.asarray(restored),
                                      np.broadcast_to(np.arange(n), (b, n)))

    def test_patchify_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        p = patchify(x, 8)
        assert p.shape == (2, 16, 8 * 8 * 3)
        y = unpatchify(p, 8, 4, 3)
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    def test_patchify_matches_patchembed_token_order(self):
        # token k of patchify must be the same pixels PatchEmbed projects at k
        x = jnp.arange(2 * 32 * 32 * 3, dtype=jnp.float32).reshape(2, 32, 32, 3)
        p = patchify(x, 8)
        # patch (row 1, col 2) in raster order = index 1*4+2
        patch = x[:, 8:16, 16:24, :].reshape(2, -1)
        np.testing.assert_array_equal(np.asarray(p[:, 6]), np.asarray(patch))


class TestMAE:
    def test_forward_shapes_and_loss(self):
        cfg = tiny_mae_config()
        model = MAE(cfg)
        images = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        params = init_model(model, images)
        pred, mask = model.apply({"params": params}, images, True,
                                 rngs={"mask": jax.random.PRNGKey(3)})
        assert pred.shape == (2, cfg.n_patches, cfg.patch_dim)
        assert pred.dtype == jnp.float32
        assert mask.shape == (2, cfg.n_patches)
        loss = mae_loss(pred, images, mask, cfg.patch_size, cfg.norm_pix)
        assert np.isfinite(float(loss))

    def test_mask_deterministic_per_key(self):
        cfg = tiny_mae_config()
        model = MAE(cfg)
        images = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        params = init_model(model, images)
        _, m1 = model.apply({"params": params}, images, True,
                            rngs={"mask": jax.random.PRNGKey(5)})
        _, m2 = model.apply({"params": params}, images, True,
                            rngs={"mask": jax.random.PRNGKey(5)})
        _, m3 = model.apply({"params": params}, images, True,
                            rngs={"mask": jax.random.PRNGKey(6)})
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        assert not np.array_equal(np.asarray(m1), np.asarray(m3))

    def test_loss_descends(self):
        cfg = tiny_mae_config(norm_pix=False)
        model = MAE(cfg)
        # fixed batch: loss must drop when overfitting it
        images = jax.random.normal(jax.random.PRNGKey(7), (4, 32, 32, 3))
        params = init_model(model, images)
        state = TrainState.create(params, optax.adam(1e-3))
        step = jax.jit(make_mae_train_step(model))
        rng = jax.random.PRNGKey(0)
        first = None
        for _ in range(30):
            state, metrics = step(state, images, rng)
            if first is None:
                first = float(metrics["train/loss"])
        last = float(metrics["train/loss"])
        assert last < first * 0.7, (first, last)

    def test_reconstruct_keeps_visible_pixels(self):
        cfg = tiny_mae_config(norm_pix=False)
        model = MAE(cfg)
        images = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        params = init_model(model, images)
        recon, mask = model.apply({"params": params}, images, True,
                                  rngs={"mask": jax.random.PRNGKey(3)},
                                  method=MAE.reconstruct)
        assert recon.shape == images.shape
        vis = np.asarray(mask[0]) == 0
        rp = np.asarray(patchify(recon, cfg.patch_size))[0]
        ip = np.asarray(patchify(images.astype(jnp.float32), cfg.patch_size))[0]
        np.testing.assert_allclose(rp[vis], ip[vis], atol=1e-6)
        assert not np.allclose(rp[~vis], ip[~vis])

    def test_encoder_flops_scale_with_keep(self):
        # the encoder sequence is len_keep+1, not n_patches+1 (the MAE speedup)
        cfg = tiny_mae_config(mask_ratio=0.75)
        assert cfg.enc_config.block_size == cfg.len_keep + 1
        assert cfg.len_keep == 4  # 16 patches * 0.25


class TestFineTuneHandoff:
    def test_mae_encoder_into_vit(self):
        cfg = tiny_mae_config()
        model = MAE(cfg)
        images = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        mae_params = init_model(model, images)

        vit_cfg = ViTConfig(32, 3, 8, "S", extra_tokens=1, dropout=0.0,
                            dtype=jnp.float32)
        vit = ViTClassifier(vit_cfg, num_classes=10)
        vit_params = vit.init(jax.random.PRNGKey(9), images)["params"]
        new = load_encoder_into_vit(mae_params, vit_params)
        # transformer weights actually transferred
        src = jax.tree_util.tree_leaves(mae_params["encoder"]["transformer"])
        dst = jax.tree_util.tree_leaves(new["vit"]["transformer"])
        assert all(np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(src, dst))
        np.testing.assert_array_equal(np.asarray(new["vit"]["extra_emb"][0]),
                                      np.asarray(mae_params["encoder"]["cls_token"][0]))
        # fresh head + pos_emb retained, and the model still runs
        logits = vit.apply({"params": new}, images, True)
        assert logits.shape == (2, 10)
        assert np.isfinite(np.asarray(logits)).all()

    def test_puzzle_into_vit(self):
        cfg = PuzzleConfig(32, 3, 8, "S", dtype=jnp.float32)
        model = Puzzle(cfg)
        images = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        pz_params = init_model(model, images)
        vit_cfg = ViTConfig(32, 3, 8, "S", extra_tokens=1, dropout=0.0,
                            dtype=jnp.float32)
        vit = ViTClassifier(vit_cfg, num_classes=10)
        vit_params = vit.init(jax.random.PRNGKey(9), images)["params"]
        new = load_puzzle_into_vit(pz_params, vit_params)
        np.testing.assert_array_equal(np.asarray(new["vit"]["pos_emb"]),
                                      np.asarray(pz_params["pos_emb"]))
        logits = vit.apply({"params": new}, images, True)
        assert logits.shape == (2, 10)


class TestPuzzle:
    def test_forward_shapes(self):
        cfg = PuzzleConfig(32, 3, 8, "S", dtype=jnp.float32)
        model = Puzzle(cfg)
        images = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        params = init_model(model, images)
        logits, mask = model.apply({"params": params}, images, True,
                                   rngs={"mask": jax.random.PRNGKey(3)})
        assert logits.shape == (2, cfg.n_patches, cfg.n_patches)
        assert logits.dtype == jnp.float32
        loss, acc = puzzle_loss(logits, mask)
        assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0

    def test_position_task_learnable(self):
        # on a fixed batch the model should learn to place patches: loss drops and
        # masked-position accuracy beats chance (1/n_patches) clearly
        cfg = PuzzleConfig(32, 3, 8, "S", mask_ratio=0.5, dtype=jnp.float32)
        model = Puzzle(cfg)
        images = jax.random.normal(jax.random.PRNGKey(7), (4, 32, 32, 3))
        params = init_model(model, images)
        state = TrainState.create(params, optax.adam(1e-3))
        step = jax.jit(make_puzzle_train_step(model))
        rng = jax.random.PRNGKey(0)
        first = None
        for _ in range(40):
            state, metrics = step(state, images, rng)
            if first is None:
                first = float(metrics["train/loss"])
        assert float(metrics["train/loss"]) < first * 0.7
        assert float(metrics["train/pos_acc"]) > 4.0 / cfg.n_patches

    def test_masked_tokens_get_no_pos_emb(self):
        # with mask_ratio=1.0 NO token receives a pos emb: outputs must be
        # permutation-equivariant w.r.t. patch order
        cfg = PuzzleConfig(32, 3, 8, "S", mask_ratio=1.0, dropout=0.0,
                           dtype=jnp.float32)
        assert cfg.len_keep == 1  # floor: at least one token keeps its pos-emb
        # use the additive-mask construction directly instead: verify that where
        # mask==1 the pos table does not affect the forward
        model = Puzzle(cfg)
        images = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
        params = init_model(model, images)
        logits1, mask = model.apply({"params": params}, images, True,
                                    rngs={"mask": jax.random.PRNGKey(3)})
        # zero the pos table rows of masked tokens: forward must be unchanged
        pos = np.asarray(params["pos_emb"]).copy()
        m = np.asarray(mask[0]) > 0
        pos[m] = 1234.5   # garbage in masked rows should not matter
        params2 = dict(params, pos_emb=jnp.asarray(pos))
        logits2, _ = model.apply({"params": params2}, images, True,
                                 rngs={"mask": jax.random.PRNGKey(3)})
        np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                                   atol=1e-5)


class TestE2EHandoff:
    def test_train_mae_then_finetune_cli(self, tmp_path):
        """Full CLI recipe: pretrain with train_mae.py, fine-tune with
        train_vit.py --init_from (subprocess, CPU, tiny shapes)."""
        import subprocess
        import sys
        from pathlib import Path

        repo = Path(__file__).parent.parent
        env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
               "HOME": "/root",
               "VIT_TPU_RUN_DIR": os.environ["VIT_TPU_RUN_DIR"],
               "VIT_TPU_JAX_CACHE": str(tmp_path / "cache")}
        common = ["--dataset", "synthetic", "--image_size", "32",
                  "--patch_size", "8", "--transformer", "S", "--bs", "8",
                  "--epochs", "1", "--steps_per_epoch", "6", "--log_every", "2",
                  "--warmup_steps", "2", "--train_steps", "20", "--no_wandb",
                  "--mixed", "false"]
        res = subprocess.run(
            [sys.executable, "train_mae.py", *common,
             "--decoder_layers", "1", "--decoder_heads", "4",
             "--decoder_embd", "64", "--ckpt_dir", str(tmp_path / "mae")],
            capture_output=True, text=True, cwd=repo, env=env, timeout=600)
        assert res.returncode == 0, res.stderr[-2000:]
        assert (tmp_path / "mae" / "best").exists()
        res = subprocess.run(
            [sys.executable, "train_vit.py", *common, "--num_classes", "4",
             "--dropout", "0.0", "--init_from", str(tmp_path / "mae"),
             "--ckpt_dir", str(tmp_path / "vit")],
            capture_output=True, text=True, cwd=repo, env=env, timeout=600)
        assert res.returncode == 0, res.stderr[-2000:]
        assert "INIT encoder from MAE checkpoint" in res.stdout


class TestMeshCompat:
    def test_mae_step_under_mesh(self):
        # the MAE step shards over the 8-virtual-device CPU mesh like any other
        from vit_tpu.parallel.mesh import make_mesh
        from vit_tpu.train.distributed import MeshRunner

        cfg = tiny_mae_config()
        model = MAE(cfg)
        images = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3))
        params = init_model(model, images)
        state = TrainState.create(params, optax.adam(1e-3))
        runner = MeshRunner(make_mesh(dp=8))
        state, st_sh = runner.shard_state(state)
        rng = runner.put_rep(jax.random.PRNGKey(0))
        step = runner.jit_step(make_mae_train_step(model),
                               in_specs=(st_sh, "batch", "rep"),
                               out_specs=(st_sh, "rep"))
        state2, metrics = step(state, runner.put_batch(images), rng)
        assert np.isfinite(float(jax.device_get(metrics["train/loss"])))

"""Tooling coverage: sweep runner grid expansion + execution, config roundtrip,
metrics logger fallback."""

import os
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "scripts"))


def test_sweep_grid_expansion_matches_wandb_semantics():
    from sweep import build_command, expand_grid

    params = {"lr": {"values": [1e-3, 1e-4]}, "dropout": {"values": [0.0, 0.1]},
              "image_size": {"value": 32}}
    combos = list(expand_grid(params))
    assert len(combos) == 4
    assert all(c["image_size"] == 32 for c in combos)
    sweep = {"program": "train_vit.py",
             "command": ["python", "${program}", "--dataset", "synthetic",
                         "${args}"]}
    cmd = build_command(sweep, combos[0], ["--no_wandb"])
    assert cmd[1] == "train_vit.py"
    assert "--dataset" in cmd and "--lr" in cmd and "--no_wandb" in cmd


def test_sweep_runner_executes_and_reports_best(tmp_path):
    sweep_yaml = tmp_path / "tiny_sweep.yaml"
    sweep_yaml.write_text("""
program: train_vit.py
method: grid
metric:
  name: valid/acc
  goal: maximize
parameters:
  lr:
    values: [1e-3]
command:
  - python
  - ${program}
  - --dataset
  - "synthetic"
  - --image_size
  - "32"
  - --patch_size
  - "8"
  - --transformer
  - "S"
  - --num_classes
  - "4"
  - --bs
  - "8"
  - --epochs
  - "1"
  - --steps_per_epoch
  - "4"
  - --dropout
  - "0.0"
  - --mixed
  - "false"
  - --warmup_steps
  - "2"
  - --train_steps
  - "50"
  - ${args}
""")
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
           "HOME": "/root",
           "VIT_TPU_RUN_DIR": os.environ["VIT_TPU_RUN_DIR"]}
    res = subprocess.run(
        [sys.executable, "scripts/sweep.py", str(sweep_yaml),
         "--ckpt_dir", str(tmp_path / "ckpt")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600)
    assert res.returncode == 0, res.stderr[-1500:]
    assert "BEST: valid/acc=" in res.stdout, res.stdout[-800:]


def test_config_dataclass_roundtrip():
    from vit_tpu.models.titok import TiTokConfig
    from vit_tpu.train.checkpoint import _config_to_dict
    from vit_tpu.utils.config import dataclass_from_dict

    cfg = TiTokConfig(64, 8, 32, 256, 12, "S")
    d = _config_to_dict(cfg)
    assert json.dumps(d)  # serializable
    cfg2 = dataclass_from_dict(TiTokConfig, d)
    cfg2.__post_init__()
    assert (cfg2.image_size, cfg2.patch_size, cfg2.latent_tokens,
            cfg2.codebook_size) == (64, 8, 32, 256)
    assert cfg2.n_patches == cfg.n_patches
    assert (cfg2.enc_vit_config.trans_config.n_embd
            == cfg.enc_vit_config.trans_config.n_embd)


def test_metrics_logger_jsonl_fallback(tmp_path):
    from vit_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger("proj", "run", config={"lr": 1e-3, "skip": object()},
                           out_dir=str(tmp_path), use_wandb=False)
    logger.log({"train/loss": np.float32(1.5)}, step=3)
    logger.log_images({"img": np.random.rand(2, 8, 8, 3)}, step=3)
    logger.close()
    lines = [json.loads(l) for l in
             (tmp_path / "proj" / "run.jsonl").read_text().splitlines()]
    assert lines[0]["_config"]["lr"] == 1e-3
    assert lines[1]["train/loss"] == 1.5 and lines[1]["_step"] == 3
    pngs = list((tmp_path / "proj" / "run_images").glob("*.png"))
    assert len(pngs) == 2


def test_metrics_logger_tensorboard_sink(tmp_path):
    """Scalars + image grids land in a readable tfevents file (the TB sink is
    the JSONL's dashboard twin; reference observability is wandb-only, SURVEY §5)."""
    from vit_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger("proj", "run", config={"lr": 1e-3},
                           out_dir=str(tmp_path), use_wandb=False)
    logger.log({"train/loss": np.float32(1.5), "_private": 7, "note": "str"},
               step=3)
    logger.log_images({"recon": np.random.rand(2, 8, 8, 3)}, step=3)
    logger.close()

    tb_dir = tmp_path / "proj" / "run_tb"
    events = list(tb_dir.glob("events.out.tfevents.*"))
    assert events, f"no tfevents file in {tb_dir}"
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader)

    seen_scalars, seen_images, seen_text = {}, set(), False
    for ev in EventFileLoader(str(events[0])).Load():
        for v in getattr(ev.summary, "value", []):
            plugin = v.metadata.plugin_data.plugin_name
            if v.HasField("simple_value"):
                seen_scalars[v.tag] = (v.simple_value, ev.step)
            elif plugin == "scalars" and v.HasField("tensor"):
                seen_scalars[v.tag] = (v.tensor.float_val[0], ev.step)
            if v.HasField("image") or plugin == "images":
                seen_images.add(v.tag)
            if v.tag.startswith("config"):
                seen_text = True
    assert seen_scalars.get("train/loss") == (1.5, 3)
    assert "_private" not in seen_scalars  # underscore keys stay JSONL-only
    assert any("recon" in t for t in seen_images)
    assert seen_text


def test_metrics_logger_histograms_and_watch_step(tmp_path):
    """wandb.watch parity (reference train_tatitok.py:155): the watch=True
    step emits per-layer grad+param histograms under metrics['_hists'], and
    MetricsLogger.log_histograms renders them into the tfevents file."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.models.titok import TiTok, TiTokConfig
    from vit_tpu.train.optim import make_optimizer
    from vit_tpu.train.state import TrainState
    from vit_tpu.train.step import make_tokenizer_train_step
    from vit_tpu.utils.logging import MetricsLogger

    cfg = TiTokConfig(image_size=16, patch_size=8, latent_tokens=4,
                      codebook_size=16, latent_dim=4, transformer="S")
    for name in ("enc_vit_config", "dec_vit_config"):
        sub = getattr(cfg, name)
        sub.trans_config = sub.trans_config.replace(n_layers=1)
    model = TiTok(cfg)
    images = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), images)["params"]
    state = TrainState.create(params, make_optimizer(1e-3, 2, 10, 1e-4, 0.0,
                                                     clip_norm=1.0))
    step = jax.jit(make_tokenizer_train_step(model, watch=True))
    usage = jnp.zeros((16,), jnp.float32)
    _, _, metrics, _ = step(state, images, usage, jax.random.PRNGKey(1))
    hists = jax.device_get(metrics["_hists"])
    assert any(k.startswith("grad_hist/") for k in hists)
    assert any(k.startswith("param_hist/") for k in hists)
    name, (counts, edges) = next(iter(hists.items()))
    assert counts.shape == (64,) and edges.shape == (65,)
    assert counts.sum() > 0

    logger = MetricsLogger("proj", "watchrun", out_dir=str(tmp_path),
                           use_wandb=False)
    logger.log_histograms(hists, step=5)
    logger.close()
    events = list((tmp_path / "proj" / "watchrun_tb").glob(
        "events.out.tfevents.*"))
    assert events
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader)

    histo_tags = set()
    for ev in EventFileLoader(str(events[0])).Load():
        for v in getattr(ev.summary, "value", []):
            # tensorboardX ≥2 writes histograms through the tensor-based
            # "histograms" plugin; older writers use the histo proto field
            if (v.HasField("histo")
                    or v.metadata.plugin_data.plugin_name == "histograms"):
                histo_tags.add(v.tag)
    assert any(t.startswith("grad_hist/") for t in histo_tags), histo_tags
    assert any(t.startswith("param_hist/") for t in histo_tags), histo_tags


def test_fusion_table_build(tmp_path):
    """scripts/fusion_table.py: grouping, self-calibrated envelope, per-class
    pools — the artifact bench.py computes open_software_pools from."""
    from fusion_table import build_table

    def row(name, cat, expr, t_us, rate_gfs):
        return {"hlo_op_name": name, "category": cat,
                "hlo_op_expression": expr, "total_self_time": t_us,
                "model_flop_rate": rate_gfs, "measured_memory_bw": 300.0,
                "occurrences": 3}

    rows = [
        # two same-signature GEMM fusions at the envelope rate
        row("fusion.1", "convolution fusion",
            "%fusion.1 = bf16[64,320,2304]{2,1,0} fusion(x)", 3000.0, 180000.0),
        row("fusion.2", "convolution fusion",
            "%fusion.2 = bf16[64,320,2304]{2,1,0} fusion(x)", 3000.0, 180000.0),
        # a straggler GEMM at half rate -> pool = ms * (1 - 90/180)
        row("fusion.3", "convolution fusion",
            "%fusion.3 = bf16[64,320,3072]{2,1,0} fusion(x)", 3000.0, 90000.0),
        # attention custom-call below the half-lane ceiling
        row("attn.1", "custom-call",
            "%attn.1 = bf16[64,320,768]{2,1,0} custom-call(x)", 3000.0, 50000.0),
        # stream op: no pool regardless of rate
        row("fusion.4", "loop fusion",
            "%fusion.4 = f32[64,320]{1,0} fusion(x)", 3000.0, 100.0),
    ]
    big, rest_ms, envelope = build_table(rows, steps=3.0, min_ms=0.5)
    assert abs(envelope - 180.0) < 1.0, envelope
    by = {e["signature"]: e for e in big}
    gemm = by["convolution fusion|fusion|bf16[64,320,3072]"]
    assert gemm["cls"] == "gemm"
    assert abs(gemm["pool_ms"] - 1.0 * (1 - 90.0 / 180.0)) < 0.01
    attn = next(e for e in big if e["cls"] == "attention")
    assert abs(attn["envelope_tf"] - 90.0) < 1.0
    assert abs(attn["pool_ms"] - 1.0 * (1 - 50.0 / 90.0)) < 0.02
    stream = next(e for e in big if e["cls"] == "stream")
    assert stream["pool_ms"] == 0.0
    assert rest_ms == 0.0

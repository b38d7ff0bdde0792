"""CPU-runnable end-to-end train_vit smoke on a tiny webdataset shard
(BASELINE.json configs[0]; SURVEY.md §4 test-strategy implication)."""

import os
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent


def test_train_vit_e2e_on_tiny_wds_shard(tmp_path):
    from vit_tpu.data.wds import ShardWriter

    rng = np.random.default_rng(0)
    with ShardWriter(str(tmp_path / "tiny-%06d.tar"), maxcount=64) as writer:
        for i in range(48):
            writer.write({"__key__": f"{i:05d}",
                          "jpg": rng.integers(0, 255, (40, 40, 3), np.uint8),
                          "cls": i % 4})

    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
           "HOME": "/root",
           "VIT_TPU_RUN_DIR": os.environ["VIT_TPU_RUN_DIR"],
           "VIT_TPU_JAX_CACHE": str(tmp_path / "cache")}
    res = subprocess.run(
        [sys.executable, "train_vit.py", "--dataset", "wds",
         "--wds_shards", str(tmp_path / "tiny-*.tar"),
         "--image_size", "32", "--patch_size", "8", "--transformer", "S",
         "--num_classes", "4", "--bs", "8", "--epochs", "2", "--dropout", "0.0",
         "--lr", "3e-4", "--warmup_steps", "2", "--train_steps", "50",
         "--log_every", "2", "--no_wandb", "--mixed", "false",
         "--ckpt_dir", str(tmp_path / "ckpt")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "STATS:" in res.stdout
    assert "epoch 1:" in res.stdout
    # best-acc checkpoint written with config
    cfg = json.loads((tmp_path / "ckpt" / "best_config.json").read_text())
    assert cfg["image_size"] == 32
    assert (tmp_path / "ckpt" / "best").exists()

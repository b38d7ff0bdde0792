"""eval_recon.py + tokenize_images.py CLI coverage (the BASELINE north-star PSNR
tool and the offline inference surface — the reference has neither, SURVEY.md §1/§4).

One tiny TiTok is trained once per module via subprocess; eval + encode/decode then
run against its checkpoint."""

import os
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
ENV = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
       "HOME": "/root",
       "VIT_TPU_RUN_DIR": os.environ["VIT_TPU_RUN_DIR"]}


def run(cmd, **kw):
    return subprocess.run([sys.executable, *cmd], capture_output=True, text=True,
                          cwd=REPO, env=ENV, timeout=600, **kw)


@pytest.fixture(scope="module")
def titok_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("titok_eval")
    res = run(["train_titok.py", "--dataset", "synthetic", "--image_size", "32",
               "--patch_size", "8", "--latent_tokens", "8", "--codebook_size", "32",
               "--latent_dim", "4", "--transformer", "S", "--bs", "8",
               "--epochs", "1", "--steps_per_epoch", "8", "--log_every", "4",
               "--warmup_steps", "2", "--train_steps", "20", "--no_wandb",
               "--mixed", "false", "--ckpt_every", "4",
               "--ckpt_dir", str(d / "ckpt")])
    assert res.returncode == 0, res.stderr[-2000:]
    assert (d / "ckpt" / "best").exists(), res.stdout[-2000:]
    return d / "ckpt"


def test_eval_recon_cli(titok_ckpt):
    res = run(["eval_recon.py", "--ckpt", str(titok_ckpt), "--model", "titok",
               "--dataset", "synthetic", "--bs", "8", "--batches", "2",
               "--lpips_weights", "random"])
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.strip().startswith("{")][-1]
    out = json.loads(line)
    assert np.isfinite(out["psnr"]) and out["n"] > 0
    assert -1.0 <= out["ssim"] <= 1.0
    assert 0.0 <= out["codebook_usage"] <= 1.0
    assert np.isfinite(out["lpips"]) and out["lpips"] >= 0.0  # random-weight smoke


def test_tokenize_roundtrip_cli(titok_ckpt, tmp_path):
    from PIL import Image

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(
            imgs / f"{i}.png")
    codes_npz = tmp_path / "codes.npz"
    res = run(["tokenize_images.py", "encode", "--ckpt", str(titok_ckpt),
               "--model", "titok", "--images", str(imgs / "*.png"),
               "--out", str(codes_npz), "--bs", "2"])
    assert res.returncode == 0, res.stderr[-2000:]
    codes = np.load(codes_npz, allow_pickle=True)["codes"]
    assert codes.shape == (3, 8)           # latent_tokens=8
    assert codes.dtype.kind in "iu"
    assert (codes >= 0).all() and (codes < 32).all()   # codebook_size=32

    out_dir = tmp_path / "recon"
    res = run(["tokenize_images.py", "decode", "--ckpt", str(titok_ckpt),
               "--model", "titok", "--codes", str(codes_npz),
               "--out_dir", str(out_dir), "--bs", "2"])
    assert res.returncode == 0, res.stderr[-2000:]
    pngs = sorted(out_dir.glob("*.png"))
    assert len(pngs) == 3
    arr = np.asarray(Image.open(pngs[0]))
    assert arr.shape == (32, 32, 3)

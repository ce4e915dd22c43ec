"""Dry-run of the real-data parity pipeline (PARITY.md §protocol) against
a LOCAL fixture: fetch_datasets ingest → structural validation → the
actual loaders read the tree. No network (offline must be a clean no-op —
that path is tested too)."""

import json
import os
import subprocess
import sys
import zipfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "fetch_datasets.py")


def _make_archive(tmp_path, n_train=3, h=16, w=16):
    """A minimal nerf_example_data.zip lookalike: blender lego + llff fern."""
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_blender_dataset
    root = tmp_path / "payload"
    lego = root / "nerf_synthetic" / "lego"
    make_blender_dataset(str(lego), n_train=n_train, n_val=1, n_test=1,
                         h=h, w=w)

    fern = root / "nerf_llff_data" / "fern"
    imdir = fern / "images"
    imdir.mkdir(parents=True)
    import cv2
    rng = np.random.RandomState(0)
    n_im = 4
    for i in range(n_im):
        cv2.imwrite(str(imdir / f"im_{i:02d}.png"),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
    pb = np.zeros((n_im, 17), np.float32)
    pb[:, -2:] = [1.0, 5.0]
    # minimal valid pose block: identity-ish 3x5 with hwf column
    for i in range(n_im):
        m = np.eye(3, 4, dtype=np.float32)
        m[:, 3] = [0, 0, i * 0.1]
        block = np.concatenate([m, np.asarray([[h], [w], [20.0]],
                                              np.float32)], axis=1)
        pb[i, :15] = block.reshape(-1)
    np.save(str(fern / "poses_bounds.npy"), pb)

    zpath = tmp_path / "nerf_example_data.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _, files in os.walk(root):
            for f in files:
                full = os.path.join(dirpath, f)
                zf.write(full, os.path.relpath(full, root))
    return zpath


def _run(args, cwd):
    return subprocess.run([sys.executable, SCRIPT] + args, cwd=cwd,
                          capture_output=True, text=True, timeout=300)


def test_local_archive_ingest_validate_and_load(tmp_path):
    zpath = _make_archive(tmp_path)
    dest = tmp_path / "data"
    r = _run(["--source", str(zpath), "--dest", str(dest)], cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "lego: ok" in r.stdout and "fern: ok" in r.stdout

    # checksum pinned on first ingest...
    lock = json.load(open(os.path.join(REPO, "scripts",
                                       "datasets.lock.json")))
    try:
        assert "archive_sha256" in lock
        # ...and verified on the second (same archive passes)
        r2 = _run(["--source", str(zpath), "--dest", str(dest)],
                  cwd=str(tmp_path))
        assert r2.returncode == 0
        # a tampered archive fails the pin
        with open(zpath, "ab") as fp:
            fp.write(b"tamper")
        r3 = _run(["--source", str(zpath), "--dest", str(dest)],
                  cwd=str(tmp_path))
        assert r3.returncode == 1 and "CHECKSUM MISMATCH" in r3.stdout
    finally:
        os.remove(os.path.join(REPO, "scripts", "datasets.lock.json"))

    # the real loader reads the ingested blender tree
    from cvnerf_tpu.data import load_scene
    scene = load_scene(str(dest / "nerf_synthetic" / "lego"), "blender",
                       half_res=False, testskip=1, white_bkg=True)
    assert scene.images.shape[0] == 5  # 3 train + 1 val + 1 test


def test_verify_only_flags_missing_images(tmp_path):
    zpath = _make_archive(tmp_path)
    dest = tmp_path / "data"
    r = _run(["--source", str(zpath), "--dest", str(dest)], cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    os.remove(os.path.join(REPO, "scripts", "datasets.lock.json"))
    # break the tree: delete one training image
    lego = dest / "nerf_synthetic" / "lego"
    man = json.load(open(lego / "transforms_train.json"))
    victim = str(lego / (man["frames"][0]["file_path"] + ".png"))
    os.remove(victim)
    r = _run(["--verify_only", "--dest", str(dest)], cwd=str(tmp_path))
    assert r.returncode == 1 and "images missing" in r.stdout


def test_offline_fetch_is_clean_noop(tmp_path):
    """No egress: the network path must exit 0 with a clear message."""
    r = _run(["--dest", str(tmp_path / "data"),
              "--url", "https://127.0.0.1:9/nope.zip"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "no-op" in r.stdout or "skipping fetch" in r.stdout


def test_lpips_golden_is_noop_without_packages(tmp_path):
    """scripts/lpips_golden.py: absent weights + absent lpips package =>
    exit 0 no-op (the golden capture runs only where the deps exist)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "lpips_golden.py"),
         "--weights", str(tmp_path / "absent.npz"),
         "--out", str(tmp_path / "golden.json")],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "no-op" in r.stdout

"""tools/convert_torch_weights.py end-to-end: torch .pth -> npz -> model."""

import os
import sys

import numpy as np
import torch
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.convert_torch_weights import convert_imagenet, convert_monodepth2
from tests.test_models import _torch_resnet


def test_imagenet_roundtrip(tmp_path):
    tmodel = _torch_resnet(18)
    src = str(tmp_path / "resnet18.pth")
    torch.save(tmodel.state_dict(), src)

    out = convert_imagenet(src, str(tmp_path / "pretrained"), 18)
    assert os.path.basename(out) == "resnet18.npz"

    # consumed by the trainer's --weight_init path
    from monodepth_tpu.config import Config
    from monodepth_tpu.training.loop import load_pretrained
    from monodepth_tpu.training.state import build_model, create_state, make_optimizer

    cfg = Config(height=64, width=96, precision="f32", scales=(0, 1),
                 weight_init=True, pretrained_dir=str(tmp_path / "pretrained"),
                 use_pallas=False)
    pre = load_pretrained(cfg)
    assert set(pre) == {"encoder", "pose_encoder"}
    # pose conv1 tiled to 6 input channels and averaged
    assert pre["pose_encoder"]["params"]["conv1"]["kernel"].shape[2] == 6

    model = build_model(cfg)
    state = create_state(cfg, model, make_optimizer(cfg, 1), pretrained=pre)
    got = np.asarray(state.params["encoder"]["conv1"]["kernel"])
    want = tmodel.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_monodepth2_reference_layout(tmp_path):
    """Reference trainer export names (encoder<N>.pt etc,
    model_tool/logger.py:60-66) convert into an eval-ready module set."""
    src = tmp_path / "torch_ckpt"
    src.mkdir()
    tmodel = _torch_resnet(18)
    torch.save(tmodel.state_dict(), str(src / "encoder21.pt"))

    written = convert_monodepth2(str(src), str(tmp_path / "npz"), 21, 18)
    assert [os.path.basename(w) for w in written] == ["encoder21.npz"]


def test_monodepth2_missing_dir_empty(tmp_path):
    src = tmp_path / "empty"
    src.mkdir()
    assert convert_monodepth2(str(src), str(tmp_path / "o"), 0, 18) == []


def test_colormap_disparity_shapes():
    from monodepth_tpu.utils.visualize import colormap_disparity, side_by_side

    disp = np.abs(np.random.default_rng(0).normal(size=(8, 12))).astype(np.float32)
    vis = colormap_disparity(disp)
    assert vis.shape == (8, 12, 3) and vis.dtype == np.uint8
    img = np.zeros((8, 12, 3), np.uint8)
    assert side_by_side(img, disp).shape == (16, 12, 3)


def test_snippet_ate():
    from tools.evaluate_poses import snippet_ate

    rng = np.random.default_rng(0)
    n = 12
    poses = [np.eye(4)]
    for _ in range(n - 1):
        step = np.eye(4)
        step[:3, 3] = [0.01 * rng.normal(), 0.0, 0.5 + 0.1 * rng.normal()]
        poses.append(poses[-1] @ step)
    gt = np.stack(poses).astype(np.float32)

    # exact prediction -> zero error
    mean, std = snippet_ate(gt, gt)
    assert mean < 1e-6

    # globally scaled prediction -> still ~zero (scale-aligned protocol)
    scaled = gt.copy()
    scaled[:, :3, 3] *= 3.7
    mean, _ = snippet_ate(scaled, gt)
    assert mean < 1e-5

    # corrupted prediction -> nonzero
    bad = gt.copy()
    bad[:, :3, 3] += rng.normal(0, 0.3, (n, 3))
    mean, _ = snippet_ate(bad, gt)
    assert mean > 0.05

    with pytest.raises(ValueError):
        snippet_ate(gt[:3], gt[:3])


def test_export_inference_stablehlo_roundtrip(tmp_path):
    """tools/export_inference.py: the depth forward exports to a
    self-contained StableHLO artifact with a SYMBOLIC batch dim; after
    serialize -> deserialize it matches direct model.apply at f32 to
    float-rounding for multiple batch sizes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from monodepth_tpu.config import Config
    from monodepth_tpu.ops.geometry import disparity_to_depth
    from monodepth_tpu.training.state import (
        build_model,
        create_state,
        make_optimizer,
    )
    from tools.export_inference import build_exported

    cfg = Config(height=32, width=64, scales=(0, 1), precision="f32",
                 weight_init=False)
    model = build_model(cfg)
    state = create_state(cfg, model, make_optimizer(cfg, 1))

    exported = build_exported(cfg, state)
    fn = jexport.deserialize(exported.serialize())

    rng = np.random.default_rng(0)
    for b in (1, 3):
        imgs = jnp.asarray(rng.random((b, 32, 64, 3)), jnp.float32)
        got = fn.call(imgs)
        disps = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, train=False, method=model.depth)
        want, _ = disparity_to_depth(disps[0].astype(jnp.float32), 1e-3, 80.0)
        want = want[..., 0]
        assert got.shape == (b, 32, 64)
        rel = float((jnp.abs(got - want) / (jnp.abs(want) + 1e-6)).max())
        assert rel < 1e-5, rel


# ---------------------------------------------------------- prepare_kitti
def _make_kitti_zip(tmp_path):
    """A miniature KITTI raw archive: one camera png + one velodyne bin."""
    import zipfile

    from PIL import Image

    drive = "2011_09_26/2011_09_26_drive_0001_sync"
    src = tmp_path / "srcs"
    img_dir = src / drive / "image_02" / "data"
    velo_dir = src / drive / "velodyne_points" / "data"
    img_dir.mkdir(parents=True)
    velo_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    Image.fromarray(rng.integers(0, 255, (16, 32, 3), np.uint8)).save(
        img_dir / "0000000000.png")
    (velo_dir / "0000000000.bin").write_bytes(b"\x00" * 64)
    zpath = tmp_path / "2011_09_26_drive_0001_sync.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for p in sorted(src.rglob("*")):
            if p.is_file():
                zf.write(p, p.relative_to(src))
    return zpath, drive


def test_prepare_kitti_end_to_end(tmp_path):
    """download (file:// URL, resumable path) -> unzip (idempotent) ->
    to_jpeg (quality-92 4:2:0 camera frames only; velodyne untouched),
    then re-run every step: all no-ops."""
    from tools.prepare_kitti import main as prep

    zpath, drive = _make_kitti_zip(tmp_path)
    out = tmp_path / "dataset"
    archives = tmp_path / "archives.txt"
    archives.write_text(f"file://{zpath}\n")

    prep(["--out", str(out), "--archives", str(archives), "--jobs", "2"])

    png = out / drive / "image_02" / "data" / "0000000000.png"
    jpg = out / drive / "image_02" / "data" / "0000000000.jpg"
    velo = out / drive / "velodyne_points" / "data" / "0000000000.bin"
    assert jpg.exists() and not png.exists()
    assert velo.read_bytes() == b"\x00" * 64
    assert (out / "zips" / zpath.name).stat().st_size == zpath.stat().st_size

    from PIL import Image

    with Image.open(jpg) as im:
        assert im.size == (32, 16) and im.format == "JPEG"

    # idempotent re-run: nothing re-converted, the jpg survives
    before = jpg.stat().st_mtime_ns
    prep(["--out", str(out), "--archives", str(archives), "--jobs", "2"])
    assert jpg.stat().st_mtime_ns == before


def test_prepare_kitti_resumes_partial_download(tmp_path):
    """A stale .part file must not corrupt the artifact: the downloader
    restarts (file:// ignores Range) and lands the exact bytes."""
    from tools.prepare_kitti import download_one

    src = tmp_path / "src.zip"
    src.write_bytes(b"ABCDEFGH" * 100)
    zip_dir = tmp_path / "zips"
    zip_dir.mkdir()
    (zip_dir / "src.zip.part").write_bytes(b"ABC")  # stale partial
    msg = download_one(f"file://{src}", str(zip_dir))
    assert (zip_dir / "src.zip").read_bytes() == src.read_bytes()
    assert "src.zip" in msg


def test_plot_curves(tmp_path):
    """tools/plot_curves.py (the reference's Tools.show_graph surface):
    loads train/valid .npy curves and writes a PNG grid; headless-safe."""
    from tools.plot_curves import load_curves, main

    loss = tmp_path / "run" / "loss"
    loss.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for split in ("train", "valid"):
        for metric in ("loss", "abs_rel", "a1"):
            np.save(loss / f"{split}_{metric}.npy", rng.random(5))
    curves = load_curves(str(tmp_path / "run"))
    assert set(curves) == {"loss", "abs_rel", "a1"}
    assert set(curves["loss"]) == {"train", "valid"}

    out = tmp_path / "curves.png"
    assert main([str(tmp_path / "run"), str(out)]) == 0
    assert out.stat().st_size > 1000

    assert main([str(tmp_path)]) == 1  # no curves -> clear failure


def test_parse_weights_spec():
    """The one shared <dir>:<epoch> parser (four CLIs drifted apart once:
    last-colon split so paths containing colons still work)."""
    from monodepth_tpu.evaluation.eigen import parse_weights_spec

    assert parse_weights_spec("./model_save/mono:22") == \
        ("./model_save/mono", 22)
    assert parse_weights_spec("./runs/12:30/mono:7") == ("./runs/12:30/mono", 7)
    for bad in ("no_epoch", "dir:", "dir:abc", ":5x"):
        with pytest.raises(ValueError):
            parse_weights_spec(bad)

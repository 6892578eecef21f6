"""Native C++ host-pipeline (JPEG decode + Lanczos resize) vs PIL."""

import numpy as np
import pytest
from PIL import Image

from monodepth_tpu import native


@pytest.fixture(scope="module")
def jpeg(tmp_path_factory, ):
    rng = np.random.default_rng(0)
    small = rng.uniform(0, 255, (24, 80, 3)).astype(np.uint8)
    img = Image.fromarray(small).resize((640, 192), Image.BILINEAR)
    path = str(tmp_path_factory.mktemp("jpg") / "x.jpg")
    img.save(path, quality=92)
    return path


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain/libjpeg unavailable")


def _pil(path, h, w):
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB").resize((w, h), Image.LANCZOS))


def test_same_size_decode_exact(jpeg, lib_ok):
    nat = native.decode_resize(jpeg, 192, 640)
    np.testing.assert_array_equal(nat, _pil(jpeg, 192, 640))


def test_downscale_matches_pil(jpeg, lib_ok):
    nat = native.decode_resize(jpeg, 96, 320).astype(int)
    pil = _pil(jpeg, 96, 320).astype(int)
    # PIL works in fixed point; allow 2/255 on a small pixel fraction
    diff = np.abs(nat - pil)
    assert diff.max() <= 3
    assert (diff > 1).mean() < 0.01


def test_flip(jpeg, lib_ok):
    nat = native.decode_resize(jpeg, 192, 640)
    natf = native.decode_resize(jpeg, 192, 640, flip=True)
    np.testing.assert_array_equal(natf, nat[:, ::-1])


def test_corrupt_jpeg_raises(tmp_path, lib_ok):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0 garbage not a jpeg")
    with pytest.raises(RuntimeError):
        native.decode_resize(str(bad), 64, 64)


def test_dataset_native_matches_pil(tmp_path, lib_ok):
    from monodepth_tpu.data.dataset import KittiDataset
    from monodepth_tpu.data.synthetic import make_kitti_tree

    root = str(tmp_path / "kitti")
    make_kitti_tree(root, num_frames=4, image_hw=(96, 320))
    lines = ["2011_09_26/2011_09_26_drive_0001_sync 1 l"]
    kw = dict(is_training=True, frame_ids=(0, -1, 1), height=96, width=320,
              load_depth=False)
    ds_nat = KittiDataset(root, lines, use_native=True, **kw)
    ds_pil = KittiDataset(root, lines, use_native=False, **kw)
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    a = ds_nat.sample(0, rng1)["frames"]
    b = ds_pil.sample(0, rng2)["frames"]
    np.testing.assert_array_equal(a, b)  # same-size path is bit-exact

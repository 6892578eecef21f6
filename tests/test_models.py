"""Model parity vs torch: encoder vs torchvision, decoders vs freshly-built
torch modules matching the official Monodepth2 architecture, shapes, and
the weight importer."""

import flax.linen  # noqa: F401  (ensure flax imports before torch on some stacks)
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from monodepth_tpu.models import (
    DepthDecoder,
    Monodepth,
    PoseCNN,
    PoseDecoder,
    ResNetEncoder,
    num_ch_enc,
)
from monodepth_tpu.utils import torch_import


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _torch_resnet(num_layers, in_images=1):
    """Standard (He et al.) ResNet in torch with torchvision-compatible
    state_dict names, built fresh for parity testing (no torchvision in
    this image)."""
    depths, kind = {18: ((2, 2, 2, 2), "basic"),
                    50: ((3, 4, 6, 3), "bottleneck")}[num_layers]

    class Basic(tnn.Module):
        def __init__(self, cin, w, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, w, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(w)
            self.conv2 = tnn.Conv2d(w, w, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(w)
            self.downsample = None
            if stride != 1 or cin != w:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, w, 1, stride, bias=False), tnn.BatchNorm2d(w))

        def forward(self, x):
            idt = self.downsample(x) if self.downsample else x
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return F.relu(out + idt)

    class Bottle(tnn.Module):
        def __init__(self, cin, w, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, w, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(w)
            self.conv2 = tnn.Conv2d(w, w, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(w)
            self.conv3 = tnn.Conv2d(w, w * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(w * 4)
            self.downsample = None
            if stride != 1 or cin != w * 4:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, w * 4, 1, stride, bias=False),
                    tnn.BatchNorm2d(w * 4))

        def forward(self, x):
            idt = self.downsample(x) if self.downsample else x
            out = F.relu(self.bn1(self.conv1(x)))
            out = F.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return F.relu(out + idt)

    block = Basic if kind == "basic" else Bottle
    exp = 1 if kind == "basic" else 4

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3 * in_images, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            cin = 64
            for stage, (d, w) in enumerate(zip(depths, (64, 128, 256, 512)), 1):
                blocks = []
                for i in range(d):
                    stride = 2 if (stage > 1 and i == 0) else 1
                    blocks.append(block(cin, w, stride))
                    cin = w * exp
                setattr(self, f"layer{stage}", tnn.Sequential(*blocks))

        def forward(self, x):
            f0 = F.relu(self.bn1(self.conv1(x)))
            f1 = self.layer1(self.maxpool(f0))
            f2 = self.layer2(f1)
            f3 = self.layer3(f2)
            f4 = self.layer4(f3)
            return [f0, f1, f2, f3, f4]

    return Net()


def _randomize_bn_stats(tmodel, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.1
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5


@pytest.mark.parametrize("num_layers", [18, 50])
def test_encoder_matches_torch(rng, num_layers):
    torch.manual_seed(0)
    tmodel = _torch_resnet(num_layers).eval()
    _randomize_bn_stats(tmodel)
    variables = torch_import.resnet_encoder_variables(
        {k: v for k, v in tmodel.state_dict().items()}, num_layers)

    x = rng.uniform(0, 1, (2, 64, 96, 3)).astype(np.float32)
    ours = ResNetEncoder(num_layers=num_layers).apply(
        variables, jnp.asarray(x), train=False)

    with torch.no_grad():
        tx = torch.from_numpy(np.transpose((x - 0.45) / 0.225, (0, 3, 1, 2)))
        theirs = tmodel(tx)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(a), _nhwc(b), rtol=1e-3, atol=1e-4)


def test_encoder_multiimage_conv1_tiling():
    tmodel = _torch_resnet(18)
    sd = tmodel.state_dict()
    variables = torch_import.resnet_encoder_variables(sd, 18, num_input_images=2)
    k = variables["params"]["conv1"]["kernel"]
    assert k.shape == (7, 7, 6, 64)
    ref = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(k[:, :, :3], ref / 2, rtol=1e-6)
    np.testing.assert_allclose(k[:, :, 3:], ref / 2, rtol=1e-6)


def _torch_depth_decoder(ch_enc, scales=range(4)):
    """Official Monodepth2 depth decoder, built fresh for the parity test."""
    ch_dec = [16, 32, 64, 128, 256]

    class C3(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = tnn.Conv2d(int(cin), int(cout), 3)
            self.pad = tnn.ReflectionPad2d(1)

        def forward(self, x):
            return self.conv(self.pad(x))

    class CB(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = C3(cin, cout)

        def forward(self, x):
            return F.elu(self.conv(x))

    class Dec(tnn.Module):
        def __init__(self):
            super().__init__()
            convs = []
            for i in range(4, -1, -1):
                cin = ch_enc[-1] if i == 4 else ch_dec[i + 1]
                convs.append(CB(cin, ch_dec[i]))
                cin = ch_dec[i] + (ch_enc[i - 1] if i > 0 else 0)
                convs.append(CB(cin, ch_dec[i]))
            for s in scales:
                convs.append(C3(ch_dec[s], 1))
            self.decoder = tnn.ModuleList(convs)

        def forward(self, feats):
            out = {}
            x = feats[-1]
            for n, i in enumerate(range(4, -1, -1)):
                x = self.decoder[2 * n](x)
                x = [F.interpolate(x, scale_factor=2, mode="nearest")]
                if i > 0:
                    x += [feats[i - 1]]
                x = torch.cat(x, 1)
                x = self.decoder[2 * n + 1](x)
                if i in scales:
                    out[i] = torch.sigmoid(self.decoder[10 + i](x))
            return out

    return Dec()


def test_depth_decoder_matches_torch(rng):
    torch.manual_seed(0)
    ch = num_ch_enc(18)
    tdec = _torch_depth_decoder(ch).eval()
    params = torch_import.depth_decoder_params(tdec.state_dict())

    H, W = 64, 96
    feats_np = [rng.standard_normal((1, H >> s, W >> s, c)).astype(np.float32)
                for s, c in zip([1, 2, 3, 4, 5], ch)]
    ours = DepthDecoder().apply({"params": params},
                                [jnp.asarray(f) for f in feats_np])
    with torch.no_grad():
        theirs = tdec([torch.from_numpy(np.transpose(f, (0, 3, 1, 2)))
                       for f in feats_np])
    for s in range(4):
        np.testing.assert_allclose(np.asarray(ours[s]), _nhwc(theirs[s]),
                                   rtol=1e-4, atol=1e-5)


def _torch_pose_decoder(ch_enc, num_input_features, num_frames):
    class PD(tnn.Module):
        def __init__(self):
            super().__init__()
            self.net = tnn.ModuleList([
                tnn.Conv2d(ch_enc[-1], 256, 1),
                tnn.Conv2d(num_input_features * 256, 256, 3, 1, 1),
                tnn.Conv2d(256, 256, 3, 1, 1),
                tnn.Conv2d(256, 6 * num_frames, 1)])

        def forward(self, feats):
            cat = [F.relu(self.net[0](f[-1])) for f in feats]
            out = torch.cat(cat, 1)
            for i in (1, 2, 3):
                out = self.net[i](out)
                if i != 3:
                    out = F.relu(out)
            out = out.mean(3).mean(2)
            out = 0.01 * out.view(-1, num_frames, 1, 6)
            return out[..., :3], out[..., 3:]

    return PD()


@pytest.mark.parametrize("nif,nf", [(1, 2), (2, 1)])
def test_pose_decoder_matches_torch(rng, nif, nf):
    torch.manual_seed(1)
    ch = num_ch_enc(18)
    tpd = _torch_pose_decoder(ch, nif, nf).eval()
    params = torch_import.pose_decoder_params(tpd.state_dict())

    feats_np = [[rng.standard_normal((2, 2, 3, c)).astype(np.float32)
                 for c in ch] for _ in range(nif)]
    ours_aa, ours_t = PoseDecoder(nif, nf).apply(
        {"params": params},
        [[jnp.asarray(f) for f in fs] for fs in feats_np])
    with torch.no_grad():
        taa, tt = tpd([[torch.from_numpy(np.transpose(f, (0, 3, 1, 2)))
                        for f in fs] for fs in feats_np])
    np.testing.assert_allclose(np.asarray(ours_aa), taa.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours_t), tt.numpy(), rtol=1e-4, atol=1e-6)


def test_pose_cnn_shapes(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 96, 6)).astype(np.float32))
    model = PoseCNN(num_input_frames=2)
    variables = model.init(jax.random.PRNGKey(0), x)
    aa, t = model.apply(variables, x)
    assert aa.shape == (2, 1, 1, 3) and t.shape == (2, 1, 1, 3)
    # outputs carry the 0.01 scaling -> small magnitudes at init
    assert float(jnp.abs(aa).max()) < 0.5


@pytest.mark.parametrize("pose_type", ["separate", "shared", "posecnn"])
def test_monodepth_forward(rng, pose_type):
    model = Monodepth(pose_type=pose_type)
    frames = jnp.asarray(rng.uniform(0, 1, (2, 3, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), frames, train=False)
    (disps, poses), _ = model.apply(variables, frames, train=True,
                                    mutable=["batch_stats"])
    assert set(disps) == {0, 1, 2, 3}
    assert disps[0].shape == (2, 64, 96, 1)
    assert disps[3].shape == (2, 8, 12, 1)
    assert set(poses) == {-1, 1}
    for aa, t in poses.values():
        assert aa.shape == (2, 3) and t.shape == (2, 3)
    assert model.invert_for_frame(-1) and not model.invert_for_frame(1)


def test_monodepth_pose_frames_all(rng):
    model = Monodepth(pose_type="posecnn", pose_frames="all")
    frames = jnp.asarray(rng.uniform(0, 1, (1, 3, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), frames, train=False)
    disps, poses = model.apply(variables, frames, train=False)
    assert set(poses) == {-1, 1}
    assert not model.invert_for_frame(-1)  # reference quirk: no invert in "all"


def test_monodepth_depth_method(rng):
    model = Monodepth()
    frames = jnp.asarray(rng.uniform(0, 1, (1, 3, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), frames, train=False)
    disps = model.apply(variables, frames[:, 0], method=Monodepth.depth)
    assert disps[0].shape == (1, 64, 96, 1)


def test_depth_decoder_nchw_matches_nhwc(rng):
    """The NCHW shift-einsum low-stage path (TPU layout optimization,
    models/depth_decoder.py docstring) is the same math and the same
    parameter tree as the plain NHWC formulation."""
    ch = num_ch_enc(18)
    H, W = 64, 96
    feats = [jnp.asarray(rng.standard_normal(
        (2, H >> s, W >> s, c)).astype(np.float32))
        for s, c in zip([1, 2, 3, 4, 5], ch)]
    params = DepthDecoder(nchw_low_stages=True).init(
        jax.random.PRNGKey(0), feats)["params"]
    out_nchw = DepthDecoder(nchw_low_stages=True).apply(
        {"params": params}, feats)
    out_nhwc = DepthDecoder(nchw_low_stages=False).apply(
        {"params": params}, feats)
    assert set(out_nchw) == set(out_nhwc) == {0, 1, 2, 3}
    for s in out_nchw:
        assert out_nchw[s].shape == out_nhwc[s].shape
        np.testing.assert_allclose(np.asarray(out_nchw[s]),
                                   np.asarray(out_nhwc[s]),
                                   rtol=1e-5, atol=1e-6)
    # bf16 (the production precision): the shift-einsum accumulates its
    # 9 taps in f32 so the whole contraction rounds once, like nn.Conv's
    # f32 conv accumulation — train (NCHW) and eval (NHWC) forwards of
    # the same params must agree to bf16 reassociation noise.
    bf = jnp.bfloat16
    out_nchw = DepthDecoder(dtype=bf).apply(
        {"params": params}, [f.astype(bf) for f in feats], use_nchw=True)
    out_nhwc = DepthDecoder(dtype=bf).apply(
        {"params": params}, [f.astype(bf) for f in feats], use_nchw=False)
    for s in out_nchw:
        np.testing.assert_allclose(np.asarray(out_nchw[s]),
                                   np.asarray(out_nhwc[s]),
                                   rtol=0, atol=0.02)


def test_decoder_nchw_active_only_in_training(rng):
    """Wiring guard for the layout win: Monodepth applies the decoder
    with use_nchw=train, so the shift-einsum ('co,bchw->bohw' dots on
    NCHW operands) must appear in the TRAIN jaxpr and must NOT appear in
    the inference (model.depth, train=False) jaxpr."""
    import jax

    from monodepth_tpu.models import Monodepth

    model = Monodepth(num_layers=18, scales=(0, 1, 2, 3),
                      frame_ids=(0, -1, 1), pose_type="separate")
    frames = jnp.asarray(rng.standard_normal(
        (1, 3, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), frames, train=False)
    # reference model with the layout optimization off: whatever its
    # jaxpr looks like under this jax/flax version is the baseline, so
    # the check survives lowering changes (einsum -> conv etc.)
    model_off = Monodepth(num_layers=18, scales=(0, 1, 2, 3),
                          frame_ids=(0, -1, 1), pose_type="separate",
                          nchw_decoder=False)

    def counts(m):
        train = str(jax.make_jaxpr(
            lambda v, f: m.apply(v, f, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)},
                                 mutable=["batch_stats"]))(variables, frames))
        infer = str(jax.make_jaxpr(
            lambda v, im: m.apply(v, im, train=False, method=m.depth))(
                variables, frames[:, 0]))
        return train.count("dot_general"), infer.count("dot_general")

    train_on, infer_on = counts(model)
    train_off, infer_off = counts(model_off)
    # train: the 9 low-stage decoder convs (upconv_{0,1,2}_{0,1} +
    # dispconv_{0,1,2}) run as shift-einsums -> 9 extra dot_generals each
    assert train_on >= train_off + 81, (train_on, train_off)
    # inference stays NHWC: identical lowering with the flag on or off
    assert infer_on == infer_off, (infer_on, infer_off)

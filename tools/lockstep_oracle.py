"""Lockstep torch twin of the FRAMEWORK's train step, for gradient and
trajectory parity from a shared converted init.

Where tests/test_parity_loss.py proves the loss *assembly* matches and
tests/test_models.py proves each *module* matches, this twin reproduces
the framework's entire training step in torch — model forward (train-mode
BN), pose wiring, per-scale warp, loss with identical tie-break noise,
and an Adam update — so a jax step and a torch step can be compared
end-to-end: same converted initial weights in, same loss / per-module
gradients / parameter trajectory out. This is the strongest accuracy
evidence obtainable with zero KITTI data (the published-metric target in
BASELINE.md still needs the real dataset).

Reference semantics being twinned (via our framework, which mirrors
them): model_tool/processor.py:33-218 (forward + pose wiring + loss),
model_train.py:64-71 (Adam update per batch).

The twin mirrors the FRAMEWORK's exact float32 operation ORDER where it
differs harmlessly from the reference (fused warp_grid einsum order,
hoisted identity term) so that f32 comparisons are limited by genuine
backend rounding, not formulation drift.

Tie-break noise: the framework draws 1e-5*N(0,1) per scale from
fold_in(state.rng, step) (losses/reprojection.py:44). `tie_noise()`
reproduces that exact key sequence with jax on CPU; the torch twin
CONSUMES those arrays, so both frameworks see bit-identical noise.

Used by tests/test_lockstep.py (short CI run) and
tools/lockstep_parity.py (the full 200-step documentation run).
"""

from __future__ import annotations

import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

VARIANTS = ("separate", "shared", "posecnn", "stereo")


def variant_config(variant: str, height: int = 64, width: int = 96,
                   batch: int = 2):
    """The framework Config for each lockstep variant (tiny CPU shapes)."""
    from monodepth_tpu.config import Config

    kw = dict(height=height, width=width, batch=batch, precision="f32",
              scales=(0, 1, 2, 3), weight_init=False, use_pallas=False,
              train_gt_metrics=False, seed=0)
    if variant == "stereo":
        kw.update(dataset="kitti_stereo", frame_ids=(0, -1, 1, "s"))
    elif variant in ("shared", "posecnn"):
        kw.update(pose_type=variant)
    elif variant != "separate":
        raise ValueError(f"unknown lockstep variant {variant!r}")
    return Config(**kw)


def make_lockstep_batches(cfg, num_batches: int, seed: int = 0):
    """Deterministic synthetic-scene batches shaped for the train step.

    Planar scenes (data/synthetic.py) so the trajectory exercises real
    photometric structure; jitter apply=0 so color_aug == color on both
    sides; the "s" frame (stereo variant) reuses the -1 frame's image —
    arbitrary but shared, which is all parity needs.
    """
    from monodepth_tpu.data import kitti
    from monodepth_tpu.data.synthetic import make_planar_scenes

    B = cfg.batch
    scenes = make_planar_scenes(num_batches * B, cfg.height, cfg.width,
                                seed=seed)
    batches = []
    for i in range(num_batches):
        sl = slice(i * B, (i + 1) * B)
        frames = scenes["frames"][sl]  # [B, 3(=0,-1,+1), H, W, 3] uint8
        if "s" in cfg.frame_ids:
            frames = np.concatenate([frames, frames[:, 1:2]], axis=1)
        batch = {
            "frames": frames[:, :len(cfg.frame_ids)],
            "jitter": np.zeros((B, 5), np.float32),
            "K": scenes["K"][sl],
            "inv_K": scenes["inv_K"][sl],
        }
        if "s" in cfg.frame_ids:
            batch["stereo_T"] = np.tile(
                kitti.stereo_transform("l", False), (B, 1, 1))
        batches.append(batch)
    return batches


def tie_noise(state_rng, step: int, cfg, dtype=np.float32):
    """The exact per-scale tie-break noise the framework's loss will draw
    at `step`: fold_in(state.rng, step), then split once per scale
    (training/step.py:229, losses/reprojection.py:44,87). `dtype` must
    match the loss dtype (f64 needs jax x64 enabled by the caller)."""
    import jax

    shape = (cfg.batch, cfg.height, cfg.width, len(cfg.source_frame_ids))
    rng = jax.random.fold_in(state_rng, step)
    out = {}
    for s in cfg.scales:
        rng, sub = jax.random.split(rng)
        out[s] = 1e-5 * np.asarray(
            jax.random.normal(sub, shape, dtype))
    return out


# --------------------------------------------------------------- torch builders
def _torch_pose_cnn(num_input_frames: int):
    """Torch twin of models/pose_decoder.py:54-81 (official Monodepth2
    PoseCNN: ReLU after every feature conv — the framework's documented
    deviation from the reference's missing first ReLU). state_dict keys
    match utils/torch_import.pose_cnn_params: net.{0..6}, pose_conv."""
    import torch
    import torch.nn as tnn

    class PC(tnn.Module):
        def __init__(self):
            super().__init__()
            specs = [(16, 7, 2), (32, 5, 2), (64, 3, 2), (128, 3, 2),
                     (256, 3, 2), (256, 3, 2), (256, 3, 2)]
            convs, cin = [], 3 * num_input_frames
            for feat, k, s in specs:
                convs.append(tnn.Conv2d(cin, feat, k, s, (k - 1) // 2))
                cin = feat
            self.net = tnn.ModuleList(convs)
            self.pose_conv = tnn.Conv2d(256, 6 * (num_input_frames - 1), 1)

        def forward(self, x):
            for conv in self.net:
                x = torch.relu(conv(x))
            x = self.pose_conv(x)
            x = x.mean(3).mean(2)
            x = 0.01 * x.view(-1, num_input_frames - 1, 1, 6)
            return x[..., :3], x[..., 3:]

    return PC()


def _transform_from_parameters(aa, t, invert: bool):
    """Torch twin of ops/geometry.transform_from_parameters (axis guard
    1e-5; invert: M = R^T @ T(-t), forward: M = T(t) @ R)."""
    import torch

    B, dt = aa.shape[0], aa.dtype
    angle = torch.linalg.norm(aa, dim=-1, keepdim=True)
    axis = aa / (angle + 1e-5)
    cos, sin = torch.cos(angle)[:, 0], torch.sin(angle)[:, 0]
    C = 1.0 - cos
    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    xs, ys, zs = x * sin, y * sin, z * sin
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    zero, one = torch.zeros_like(cos), torch.ones_like(cos)
    R = torch.stack([
        x * xC + cos, xyC - zs, zxC + ys, zero,
        xyC + zs, y * yC + cos, yzC - xs, zero,
        zxC - ys, yzC + xs, z * zC + cos, zero,
        zero, zero, zero, one,
    ], dim=-1).reshape(B, 4, 4)
    if invert:
        R = R.transpose(1, 2)
        t = -t
    T = torch.eye(4, dtype=dt).repeat(B, 1, 1)
    T[:, :3, 3] = t
    return R @ T if invert else T @ R


def _warp_grid(depth, inv_K, K, T):
    """Torch twin of ops/geometry.warp_grid (the fused einsum order).
    depth: [B,1,H,W] -> grid [B,H,W,2] in [-1,1]."""
    import torch

    B, _, H, W = depth.shape
    dt = depth.dtype
    ys, xs = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
    pix = torch.stack([xs, ys, torch.ones_like(xs)], 0).reshape(3, -1).to(dt)

    P = (K @ T)[:, :3, :]                     # [B,3,4]
    A = P[:, :, :3] @ inv_K[:, :3, :3]        # [B,3,3]
    rays = A @ pix                            # [B,3,HW]
    pts = rays * depth.reshape(B, 1, H * W) + P[:, :, 3:4]
    xy = pts[:, :2] / (pts[:, 2:3] + 1e-7)
    xy = xy.reshape(B, 2, H, W).permute(0, 2, 3, 1)
    scale = torch.tensor([W - 1, H - 1]).to(dt)
    return (xy / scale - 0.5) * 2.0


def _ssim(x, y):
    """Torch twin of ops/ssim.ssim (reference model_loss.py:11-41)."""
    import torch
    import torch.nn as tnn

    pad = tnn.ReflectionPad2d(1)
    pool = tnn.AvgPool2d(3, 1)
    x, y = pad(x), pad(y)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x ** 2) - mu_x ** 2
    sigma_y = pool(y ** 2) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def _reproj_err(pred, target):
    import torch

    return (0.85 * _ssim(pred, target).mean(1, True)
            + 0.15 * torch.abs(target - pred).mean(1, True))


class TorchTwin:
    """Torch replica of (model, train step) for one lockstep variant.

    Build with the same seed-independent torch default init, export the
    converted weights with `flax_variables()`, then drive `train_step`
    with the noise arrays from `tie_noise` — the jax framework stepping
    from the converted init must reproduce the same losses/grads.
    """

    def __init__(self, variant: str, cfg, seed: int = 0,
                 double: bool = False):
        import torch
        import test_models as tm

        self.variant = variant
        self.cfg = cfg
        self.tdtype = torch.float64 if double else torch.float32
        torch.manual_seed(seed)
        ch = [64, 64, 128, 256, 512]
        self.encoder = tm._torch_resnet(cfg.num_layers)
        self.decoder = tm._torch_depth_decoder(ch, scales=cfg.scales)
        self.pose_encoder = None
        self.pose_cnn = None
        self.pose_decoder = None
        if cfg.pose_type == "separate":
            self.pose_encoder = tm._torch_resnet(cfg.num_layers, in_images=2)
            self.pose_decoder = tm._torch_pose_decoder(ch, 1, 2)
        elif cfg.pose_type == "shared":
            self.pose_decoder = tm._torch_pose_decoder(ch, 2, 1)
        else:  # posecnn
            self.pose_cnn = _torch_pose_cnn(2)
        self.modules = torch.nn.ModuleList(
            [m for m in (self.encoder, self.decoder, self.pose_encoder,
                         self.pose_cnn, self.pose_decoder) if m is not None])
        if double:
            self.modules.double()
        self.modules.train()
        self.opt = None

    # ---------------------------------------------------------- conversion
    def flax_variables(self):
        """(params, batch_stats) trees in the Monodepth layout, via the
        production importers (utils/torch_import.py)."""
        return self._convert(self._state_dicts())

    def grads_flax(self):
        """Per-module parameter gradients, converted to the flax layout by
        the same importers (a grad transposes exactly like its weight)."""
        params, _ = self._convert(self._state_dicts(grads=True))
        return params

    def _state_dicts(self, grads: bool = False):
        import torch

        def sd(module):
            if not grads:
                return {k: v.detach() for k, v in module.state_dict().items()}
            out = {k: (p.grad if p.grad is not None else torch.zeros_like(p))
                   for k, p in module.named_parameters()}
            for k, b in module.named_buffers():  # BN running stats: no grads
                out[k] = torch.zeros_like(b)
            return out

        return {name: sd(m) for name, m in (
            ("encoder", self.encoder), ("decoder", self.decoder),
            ("pose_encoder", self.pose_encoder), ("pose_cnn", self.pose_cnn),
            ("pose_decoder", self.pose_decoder)) if m is not None}

    def _convert(self, sds):
        from monodepth_tpu.utils import torch_import as ti

        cfg = self.cfg
        params, stats = {}, {}
        enc = ti.resnet_encoder_variables(sds["encoder"], cfg.num_layers)
        params["encoder"], stats["encoder"] = enc["params"], enc["batch_stats"]
        params["decoder"] = ti.depth_decoder_params(
            sds["decoder"], scales=cfg.scales)
        if "pose_encoder" in sds:
            pe = ti.resnet_encoder_variables(sds["pose_encoder"],
                                             cfg.num_layers,
                                             num_input_images=2)
            params["pose_encoder"] = pe["params"]
            stats["pose_encoder"] = pe["batch_stats"]
        if "pose_cnn" in sds:
            params["pose_decoder"] = ti.pose_cnn_params(sds["pose_cnn"])
        if "pose_decoder" in sds:
            params["pose_decoder"] = ti.pose_decoder_params(
                sds["pose_decoder"])
        return params, stats

    # ------------------------------------------------------------- forward
    def _encode(self, encoder, x):
        return encoder((x - 0.45) / 0.225)  # ResNetEncoder normalizes inside

    def _forward(self, color):
        """color: [B, F, 3, H, W] float in [0,1] -> (disps {s: [B,1,h,w]},
        poses {fid: (aa [B,3], t [B,3])}). Twin of Monodepth.__call__."""
        import torch

        cfg = self.cfg
        frame_ids = list(cfg.frame_ids)
        B, F = color.shape[:2]
        sources = [f for f in frame_ids[1:] if f != "s"]

        if cfg.pose_type == "shared":
            stacked = torch.cat([color[:, i] for i in range(F)], 0)
            feats = self._encode(self.encoder, stacked)
            per_frame = {fid: [f[i * B:(i + 1) * B] for f in feats]
                         for i, fid in enumerate(frame_ids)}
            disps = self.decoder(per_frame[0])
        else:
            disps = self.decoder(
                self._encode(self.encoder, color[:, 0]))

        poses = {}
        for fid in sources:
            pair = (fid, 0) if fid < 0 else (0, fid)
            if cfg.pose_type == "posecnn":
                x = torch.cat([color[:, frame_ids.index(p)] for p in pair], 1)
                aa, t = self.pose_cnn(x)
            elif cfg.pose_type == "shared":
                aa, t = self.pose_decoder([per_frame[p] for p in pair])
            else:
                x = torch.cat([color[:, frame_ids.index(p)] for p in pair], 1)
                aa, t = self.pose_decoder([self._encode(self.pose_encoder, x)])
            poses[fid] = (aa[:, 0, 0], t[:, 0, 0])
        return disps, poses

    # ---------------------------------------------------------------- loss
    def loss(self, batch, noise):
        """The framework's train-step loss on `batch` with the given
        per-scale tie-break noise ({scale: np [B,H,W,F_src]}). Twin of
        training/step.apply_and_warp + losses/reprojection.monodepth_loss."""
        import torch
        import torch.nn.functional as F

        cfg = self.cfg
        H, W = cfg.height, cfg.width
        frame_ids = list(cfg.frame_ids)
        source_ids = list(cfg.source_frame_ids)

        color = (torch.from_numpy(batch["frames"]).to(self.tdtype) / 255.0
                 ).permute(0, 1, 4, 2, 3)  # [B,F,3,H,W]; jitter apply=0
        K = torch.from_numpy(batch["K"]).to(self.tdtype)
        inv_K = torch.from_numpy(batch["inv_K"]).to(self.tdtype)

        disps, poses = self._forward(color)
        target = color[:, 0]
        sources = {fid: color[:, frame_ids.index(fid)] for fid in source_ids}

        invert = lambda fid: cfg.pose_frames != "all" and fid < 0
        transforms = {}
        if cfg.pose_type in ("shared", "separate"):
            for fid in source_ids:
                if fid != "s":
                    aa, t = poses[fid]
                    transforms[fid] = _transform_from_parameters(
                        aa, t, invert(fid))

        with torch.no_grad():  # identity term carries no parameter gradient
            identity = torch.cat(
                [_reproj_err(sources[f], target) for f in source_ids], 1) \
                if cfg.use_automasking else None

        # target pyramid: 2x2 area downsample (ops/sampling.pyramid)
        pyr = [target]
        for _ in range(max(cfg.scales)):
            pyr.append(F.avg_pool2d(pyr[-1], 2))

        min_disp, max_disp = 1.0 / cfg.max_depth, 1.0 / cfg.min_depth
        total = 0.0
        for s in cfg.scales:
            disp = disps[s]
            disp_full = F.interpolate(disp, (H, W), mode="bilinear",
                                      align_corners=False) if s else disp
            depth = 1.0 / (min_disp + (max_disp - min_disp) * disp_full)

            reproj = []
            for fid in source_ids:
                if fid == "s":
                    T = torch.from_numpy(batch["stereo_T"]).to(self.tdtype)
                elif cfg.pose_type == "posecnn":
                    aa, t = poses[fid]
                    mean_inv_depth = (1.0 / depth).mean((1, 2, 3))
                    T = _transform_from_parameters(
                        aa, t * mean_inv_depth[:, None], invert(fid))
                else:
                    T = transforms[fid]
                warped = F.grid_sample(
                    sources[fid], _warp_grid(depth, inv_K, K, T),
                    mode="bilinear", padding_mode="border",
                    align_corners=True)
                reproj.append(_reproj_err(warped, target))
            combined = torch.cat(reproj, 1)
            if identity is not None:
                noise_t = torch.from_numpy(noise[s]).to(self.tdtype) \
                    .permute(0, 3, 1, 2)
                combined = torch.cat([identity + noise_t, combined], 1)
            photometric = combined.min(1)[0].mean() if combined.shape[1] > 1 \
                else combined[:, 0].mean()

            color_s = pyr[s]
            norm = disp / (disp.mean((2, 3), True) + 1e-7)
            gx = torch.abs(norm[..., :-1] - norm[..., 1:])
            gy = torch.abs(norm[..., :-1, :] - norm[..., 1:, :])
            ix = torch.abs(color_s[..., :-1] - color_s[..., 1:]
                           ).mean(1, True)
            iy = torch.abs(color_s[..., :-1, :] - color_s[..., 1:, :]
                           ).mean(1, True)
            smooth = (gx * torch.exp(-ix)).mean() + (gy * torch.exp(-iy)).mean()
            total = total + photometric + cfg.disp_smoothness * smooth / (2 ** s)
        return total / len(cfg.scales)

    # ------------------------------------------------------------- training
    def init_optimizer(self, lr: float):
        import torch

        self.opt = torch.optim.Adam(self.modules.parameters(), lr=lr,
                                    betas=(0.9, 0.999), eps=1e-8)

    def train_step(self, batch, noise) -> float:
        """One backward + Adam update; returns the loss."""
        loss = self.loss(batch, noise)
        self.opt.zero_grad()
        loss.backward()
        self.opt.step()
        return float(loss.detach())


# ---------------------------------------------------------------- harnesses
# The single-step and trajectory comparison drivers, shared by
# tests/test_lockstep.py (short CI run), tools/lockstep_parity.py (the
# 200-step documentation run) and tools/diag_lockstep.py (error-structure
# diagnosis) so the three surfaces cannot drift apart.

LOCKSTEP_RNG_SEED = 7  # the TrainState rng both sides draw tie noise from


def lockstep_single_step(variant: str, double: bool = True):
    """One train step in both frameworks from a shared converted init.

    Returns {"t_loss", "j_loss" (floats), "t_grads", "j_grads"
    (per-module gradient trees)}. With double=True everything runs in
    float64 under `jax.enable_x64`, where backend rounding vanishes
    (~1e-14) and only semantic differences remain."""
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.training.step import _loss_from_outputs, apply_and_warp

    with jax.enable_x64(double):
        dt = np.float64 if double else np.float32
        jdt = jnp.float64 if double else jnp.float32
        cfg = variant_config(variant)
        twin = TorchTwin(variant, cfg, seed=0, double=double)
        params, batch_stats = twin.flax_variables()
        if double:
            from monodepth_tpu.models.monodepth import Monodepth

            model = Monodepth(num_layers=cfg.num_layers, scales=cfg.scales,
                              frame_ids=cfg.frame_ids,
                              pose_type=cfg.pose_type,
                              pose_frames=cfg.pose_frames, dtype=jnp.float64,
                              nchw_decoder=cfg.nchw_decoder)
        else:
            from monodepth_tpu.training.state import build_model

            model = build_model(cfg)
        batch = make_lockstep_batches(cfg, 1, seed=0)[0]
        for k in ("jitter", "K", "inv_K", "stereo_T"):
            if k in batch:
                batch[k] = batch[k].astype(dt)
        rng0 = jax.random.PRNGKey(LOCKSTEP_RNG_SEED)
        noise = tie_noise(rng0, 0, cfg, dt)

        # torch side: loss + grads (grads convert via the production
        # importers, which preserve f64)
        t_loss = twin.loss(batch, noise)
        t_loss.backward()
        t_grads = twin.grads_flax()

        # jax side: the framework's own loss graph (training/step.py)
        rng = jax.random.fold_in(rng0, 0)
        batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
        to_j = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jnp.asarray(x, jdt), t)

        def loss_fn(p):
            variables = {"params": p, "batch_stats": to_j(batch_stats)}
            out = apply_and_warp(model, variables, batch_j, cfg, train=True)
            return _loss_from_outputs(out, rng, cfg, train=True)[0]

        j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(to_j(params))
        return {"t_loss": float(t_loss.detach()), "j_loss": float(j_loss),
                "t_grads": t_grads, "j_grads": jax.device_get(j_grads)}


def lockstep_trajectory(variant: str, steps: int, num_batches: int = 4,
                        check_structure: bool = True,
                        verbose_every: int = 0):
    """`steps` lockstep Adam steps at f32 (production precision).

    Returns {"torch_losses", "jax_losses", "rel_diffs"} (python floats,
    one per step). check_structure asserts the converted tree IS the
    model's init tree (importer completeness guard)."""
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.training.state import (
        TrainState, build_model, make_optimizer)
    from monodepth_tpu.training.step import make_train_step

    cfg = variant_config(variant)
    twin = TorchTwin(variant, cfg, seed=0)
    params, batch_stats = twin.flax_variables()
    model = build_model(cfg)
    batches = make_lockstep_batches(cfg, num_batches=num_batches, seed=0)

    if check_structure:
        ref = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, len(cfg.frame_ids), cfg.height,
                                    cfg.width, 3), jnp.float32), train=False)
        assert jax.tree.structure(params) == jax.tree.structure(
            dict(ref["params"]))
        assert jax.tree.structure(batch_stats) == jax.tree.structure(
            dict(ref["batch_stats"]))

    to_f32 = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jnp.asarray(x, jnp.float32), t)
    rng0 = jax.random.PRNGKey(LOCKSTEP_RNG_SEED)
    tx = make_optimizer(cfg, steps_per_epoch=10 ** 6)  # constant lr window
    params = to_f32(params)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       batch_stats=to_f32(batch_stats),
                       opt_state=tx.init(params), rng=rng0)
    step = make_train_step(model, tx, cfg, donate=False)
    twin.init_optimizer(cfg.learning_rate)

    t_losses, j_losses, diffs = [], [], []
    for k in range(steps):
        batch = batches[k % len(batches)]
        noise = tie_noise(rng0, k, cfg)
        t_loss = twin.train_step(batch, noise)
        state, metrics = step(state, {k_: jnp.asarray(v)
                                      for k_, v in batch.items()})
        j_loss = float(metrics["loss"])
        t_losses.append(t_loss)
        j_losses.append(j_loss)
        diffs.append(abs(j_loss - t_loss) / abs(t_loss))
        if verbose_every and (k + 1) % verbose_every == 0:
            print(f"    step {k+1:4d}: torch {t_loss:.6f} jax {j_loss:.6f} "
                  f"rel {diffs[-1]:.2e}", flush=True)
    return {"torch_losses": t_losses, "jax_losses": j_losses,
            "rel_diffs": diffs}

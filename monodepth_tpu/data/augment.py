"""Device-side augmentation: color jitter on TPU, pure jnp / VPU.

The reference jitters 4 resized PIL copies per frame on the host with
torchvision ColorJitter (kitti_mono.py:284-285, 346-366). Here the host
ships one uint8 frame and the jitter (brightness/contrast/saturation in
[0.8, 1.2], hue in [-0.1, 0.1]) runs on device — elementwise VPU math that
XLA fuses with the uint8 decode. Factors are sampled per-sample on the
host so the training distribution matches.

Fixed application order brightness -> contrast -> saturation -> hue
(torchvision samples a random order; documented deviation — each factor's
marginal distribution is identical). NOTE: the reference's v2 mono loader
accidentally sampled ONE jitter for the entire training run
(kitti_mono.py:284 samples in __init__); per-sample jitter is the correct
behavior (matches official Monodepth2 and the reference's stereo loader,
kitti_stereo.py:270).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rgb_to_hsv(rgb: Array) -> Array:
    """[..., 3] RGB in [0,1] -> HSV (h in [0,1))."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    safe = jnp.where(delta > 0, delta, 1.0)
    s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)

    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: Array) -> Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _grayscale(img: Array) -> Array:
    """ITU-R 601 luma, the torchvision rgb_to_grayscale convention."""
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return (img * w).sum(axis=-1, keepdims=True)


def color_jitter(img: Array, jitter: Array) -> Array:
    """Apply per-sample jitter. img: [B, ..., 3] float in [0,1];
    jitter: [B, 5] = [apply, brightness, contrast, saturation, hue]."""
    B = img.shape[0]
    expand = (B,) + (1,) * (img.ndim - 1)
    apply = jitter[:, 0].reshape(expand)
    bright = jitter[:, 1].reshape(expand)
    contrast = jitter[:, 2].reshape(expand)
    sat = jitter[:, 3].reshape(expand)
    hue = jitter[:, 4].reshape((B,) + (1,) * (img.ndim - 2))

    out = jnp.clip(img * bright, 0.0, 1.0)

    # torchvision adjust_contrast blends toward EACH image's own gray
    # mean — over (H, W) only, so a [B, F, H, W, 3] frame stack jitters
    # per frame exactly as the reference's per-PIL-image ColorJitter does
    # (a joint mean over F would shift every frame's contrast whenever
    # the -1/0/+1 frames differ in exposure)
    gray_mean = _grayscale(out).mean(axis=(-3, -2), keepdims=True)
    out = jnp.clip(contrast * out + (1.0 - contrast) * gray_mean, 0.0, 1.0)

    out = jnp.clip(sat * out + (1.0 - sat) * _grayscale(out), 0.0, 1.0)

    hsv = rgb_to_hsv(out)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + hue) % 1.0)
    out = jnp.clip(hsv_to_rgb(hsv), 0.0, 1.0)

    return jnp.where(apply > 0, out, img)


def decode_frames(frames_u8: Array, jitter: Array):
    """uint8 frames [B, F, H, W, 3] -> (color, color_aug) float in [0,1].

    Decodes to f32, or wider if the host ships wider jitter factors — the
    f64 lockstep parity tests (tests/test_lockstep.py) drive the whole
    train-step graph in float64 this way; production jitter is f32."""
    dtype = jnp.promote_types(jnp.float32, jitter.dtype)
    color = frames_u8.astype(dtype) / 255.0
    color_aug = color_jitter(color, jitter)
    return color, color_aug

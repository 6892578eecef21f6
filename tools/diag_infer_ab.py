"""A/B the NCHW decoder for inference-only (fwd, no backward).

The shift-einsum decoder was chosen on fwd+bwd train-step evidence;
this checks the fwd-only path didn't regress vs the NHWC formulation.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monodepth_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import monodepth_tpu.models.depth_decoder as dd
    from monodepth_tpu.config import Config
    from monodepth_tpu.training.state import (
        build_model,
        create_state,
        make_optimizer,
    )
    from monodepth_tpu.training.step import make_infer_step

    for batch, label in ((12, "b12"), (16, "b16")):
        cfg = Config(height=192, width=640, batch=batch, weight_init=False)
        img = jax.random.uniform(
            jax.random.PRNGKey(0), (batch, 192, 640, 3),
            jnp.float32)
        for nchw_max, name in ((2, "nchw decoder"), (-1, "nhwc decoder")):
            dd._NCHW_MAX_STAGE = nchw_max
            model = build_model(cfg)
            tx = make_optimizer(cfg, steps_per_epoch=1000)
            state = jax.device_put(create_state(cfg, model, tx),
                                   jax.devices()[0])
            infer = make_infer_step(model, cfg)

            @jax.jit
            def infer_n(state, img, _infer=infer):
                def body(i, d):
                    return _infer(state,
                                  img + jnp.expand_dims(d, -1) * 1e-12)
                return lax.fori_loop(0, 10, body,
                                     jnp.zeros(img.shape[:3], jnp.float32))

            d = infer_n(state, img)
            _ = float(jnp.sum(d))
            t0 = time.perf_counter()
            d = infer_n(state, img)
            _ = float(jnp.sum(d))
            dt = (time.perf_counter() - t0) / 10 * 1e3
            print(f"{label} {name}: {dt:.1f} ms/batch "
                  f"({batch / dt * 1e3:.0f} img/s)")
    dd._NCHW_MAX_STAGE = 2


if __name__ == "__main__":
    main()

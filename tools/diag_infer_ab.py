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

    from monodepth_tpu.config import Config
    from monodepth_tpu.training.state import (
        build_model,
        create_state,
        make_optimizer,
    )
    for batch, label in ((12, "b12"), (16, "b16")):
        cfg = Config(height=192, width=640, batch=batch, weight_init=False)
        img = jax.random.uniform(
            jax.random.PRNGKey(0), (batch, 192, 640, 3),
            jnp.float32)
        for use_nchw, name in ((True, "nchw decoder"), (False, "nhwc decoder")):
            # NOTE: make_infer_step goes through model.depth(train=False),
            # which pins use_nchw=False (the production choice this tool
            # motivated) — so the A/B applies the decoder directly with
            # an explicit use_nchw instead.
            model = build_model(cfg)
            tx = make_optimizer(cfg, steps_per_epoch=1000)
            state = jax.device_put(create_state(cfg, model, tx),
                                   jax.devices()[0])

            def fwd(state, im, _u=use_nchw, _m=model):
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}
                return _m.apply(
                    variables, im,
                    method=lambda m, x: m.decoder(m.encoder(x, False),
                                                  use_nchw=_u))[0]

            @jax.jit
            def infer_n(state, img, _fwd=fwd):
                def body(i, d):
                    return _fwd(state, img + d * 1e-12)
                return lax.fori_loop(
                    0, 10, body,
                    jnp.zeros(img.shape[:3] + (1,), jnp.float32))

            d = infer_n(state, img)
            _ = float(jnp.sum(d))
            t0 = time.perf_counter()
            d = infer_n(state, img)
            _ = float(jnp.sum(d))
            dt = (time.perf_counter() - t0) / 10 * 1e3
            print(f"{label} {name}: {dt:.1f} ms/batch "
                  f"({batch / dt * 1e3:.0f} img/s)")


if __name__ == "__main__":
    main()

"""NaN hunt phase 3: dissect the encoder on the reproducing residual."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env
apply_platform_from_env()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mptpu.models.siam import SIAMModel
from mptpu.train.checkpoint import load_checkpoint


def main():
    ckpt = "trained_weights/siam_quality_dense2/ckpt_000008125.pkl"
    bad = np.load("trained_weights/nan_hunt/bad_batch.npz")
    batch = jnp.asarray(bad["batch"])
    key_fold = int(bad["key_fold"])

    n_samples, n_events, hidden, context_dim = 2**17, 32, 128, 32
    window, step_sz = 2048, 256
    model = SIAMModel(
        n_samples=n_samples, context_dim=context_dim,
        in_channels=window // 2 + 1, hidden_channels=hidden,
        n_events=n_events, transform_window_size=window,
        transform_step_size=step_sz, fft_resonance=True,
        attn_floor=0.01, attn_leak=0.1,
    )
    payload = load_checkpoint(ckpt)
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    key = jax.random.fold_in(jax.random.PRNGKey(0), key_fold)

    @jax.jit
    def first_step(params, spec, key):
        v, sched = model.apply(params, spec, method=SIAMModel.encode)
        ch = model.apply(params, v, sched, key, method=SIAMModel.generate)
        return lax.stop_gradient(spec - model.transform(ch))

    spec0 = model.transform(batch)
    spec1 = first_step(params, spec0, jax.random.fold_in(key, 0))

    @jax.jit
    def dissect(params, spec):
        def inner(mdl):
            encoded = mdl.encoder(spec)  # (batch, hidden, frames)
            ev_in = jnp.transpose(encoded, (0, 2, 1))
            ev = mdl.to_event_vectors(ev_in)
            sw = mdl.to_event_switch(ev_in)[..., 0]  # (batch, frames)
            pos = jnp.argmax(
                jnp.where(
                    jnp.arange(sw.shape[-1]) < sw.shape[-1] // 2, sw, -jnp.inf
                ),
                axis=-1,
            )
            enc_at = jax.vmap(lambda e, p: e[p])(ev_in, pos)  # (batch, hidden)
            ev_at = jax.vmap(lambda e, p: e[p])(ev, pos)
            sw_at = jax.vmap(lambda s, p: s[p])(sw, pos)
            return {
                "encoded_absmax": jnp.max(jnp.abs(encoded), axis=(1, 2)),
                "sw_max": jnp.max(sw, axis=-1),
                "sw_at": sw_at,
                "pos": pos,
                "enc_at_absmax": jnp.max(jnp.abs(enc_at), axis=-1),
                "ev_at_absmax": jnp.max(jnp.abs(ev_at), axis=-1),
            }
        return model.apply(params, method=inner)

    for name, spec in [("spec0", spec0), ("spec1", spec1)]:
        stats = dissect(params, spec)
        out = {k: np.asarray(v).tolist() for k, v in stats.items()}
        print(name, json.dumps(out), flush=True)
        print(f"{name} absmax {float(jnp.max(jnp.abs(spec))):.4g} "
              f"min {float(jnp.min(spec)):.4g}", flush=True)


if __name__ == "__main__":
    main()

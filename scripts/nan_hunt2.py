"""NaN hunt phase 2: per-event localization on the captured bad batch.

Replays the 32-event iterative loop event by event on the reproducing
(params, batch, key) from nan_hunt.py, logging absmax/finiteness of the
event vector, scheduling, decoded channel and residual spectrogram at
every step; then dumps the decoder's internal intermediates and the
multihead head outputs for the first exploding event.
"""

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
    print(f"bad batch fold {key_fold}, shape {batch.shape}", flush=True)

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
    def event_step(params, spec, key):
        v, sched = model.apply(params, spec, method=SIAMModel.encode)
        ch = model.apply(params, v, sched, key, method=SIAMModel.generate)
        current = model.transform(ch)
        new_spec = lax.stop_gradient(spec - current)
        stats = {
            "v_absmax": jnp.max(jnp.abs(v)),
            "v_bad": jnp.sum(~jnp.isfinite(v)),
            "sched_absmax": jnp.max(jnp.abs(sched)),
            "ch_absmax": jnp.max(jnp.abs(ch)),
            "ch_bad": jnp.sum(~jnp.isfinite(ch)),
            "spec_absmax": jnp.max(jnp.abs(new_spec)),
            "spec_bad": jnp.sum(~jnp.isfinite(new_spec)),
        }
        return new_spec, v, sched, stats

    spec = model.transform(batch)
    print(f"spec0 absmax {float(jnp.max(jnp.abs(spec))):.4g}", flush=True)

    first_bad = None
    for i in range(n_events):
        spec, v, sched, stats = event_step(
            params, spec, jax.random.fold_in(key, i)
        )
        s = {k: float(x) for k, x in stats.items()}
        print(f"event {i}: " + json.dumps(s), flush=True)
        if first_bad is None and (
            not np.isfinite(s["ch_absmax"]) or s["ch_absmax"] > 1e12
            or s["ch_bad"] > 0 or s["v_bad"] > 0
        ):
            first_bad = (i, v, sched)
            break

    if first_bad is None:
        print("no explosion reproduced in isolation — scan-order effect?",
              flush=True)
        return

    i, v, sched = first_bad
    print(f"--- dissecting event {i} ---", flush=True)

    @jax.jit
    def dissect(params, v, sched, key):
        # reach inside: multihead then resonance with intermediates
        def inner(mdl):
            choices = mdl.multihead(v)
            out, inter = mdl.resonance(
                choices, sched, key, return_intermediates=True
            )
            return choices, out, inter
        return model.apply(params, method=inner)

    choices, out, inter = dissect(params, v, sched, jax.random.fold_in(key, i))
    for name, val in sorted(choices.items()):
        print(f"head {name}: absmax {float(jnp.max(jnp.abs(val))):.4g}",
              flush=True)
    for name, val in inter.items():
        print(f"intermediate {name}: absmax "
              f"{float(jnp.max(jnp.abs(val))):.4g} "
              f"bad {int(jnp.sum(~jnp.isfinite(val)))}", flush=True)
    print(f"decoder out absmax {float(jnp.max(jnp.abs(out))):.4g}", flush=True)


if __name__ == "__main__":
    main()

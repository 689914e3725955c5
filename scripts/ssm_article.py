"""Playable state-space model: overfit a single segment, export a web
article + the learned weights for a browser synth (reference ``ssm.py``
— BASELINE config #5: n_samples 2^18, window 128, control plane 64,
state 128, top-512 active sites).

Usage:
  python scripts/ssm_article.py [--tiny] [--iterations N] [--article out.html]
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env
apply_platform_from_env()

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mptpu.data import get_one_audio_segment
from mptpu.losses import flattened_multiband_spectrogram
from mptpu.models import OverfitControlPlane
from mptpu.obs import conjure_article, AudioComponent, ImageComponent
from mptpu.ops import max_norm


def transform(x):
    """Multiband loss feature (reference ``ssm.py:390-413``)."""
    return flattened_multiband_spectrogram(
        x, stft_spec={"xs": (64, 16)}, smallest_band_size=512
    )


def l0_norm(x, epsilon: float = 1e-6):
    """Differentiable-ish active-site count (reference ``ssm.py:502``)."""
    return jnp.sum(jnp.abs(x) > epsilon)


def generate_param_dict(params) -> dict:
    """Base64 weights JSON for the web synth (reference
    ``ssm.py:345-367``)."""
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, value in flat:
        key = "/".join(str(p) for p in path)
        arr = np.asarray(value, dtype=np.float32)
        out[key] = {
            "shape": list(arr.shape),
            "data": base64.b64encode(arr.tobytes()).decode(),
        }
    return out


def train_model_for_segment(
    n_samples: int = 2**18,
    window_size: int = 128,
    control_plane_dim: int = 64,
    state_dim: int = 128,
    n_active_sites: int = 512,
    n_iterations: int = 1000,
    lr: float = 1e-2,
    article_path: str | None = None,
    audio_path: str | None = None,
    boundary_weight: float = 1.0,
):
    samplerate = 22050
    target = get_one_audio_segment(
        n_samples, samplerate, audio_path=audio_path
    ).reshape(1, 1, n_samples)

    model = OverfitControlPlane(
        control_plane_dim=control_plane_dim,
        input_dim=window_size,
        state_matrix_dim=state_dim,
        n_samples=n_samples,
        window_size=window_size,
        n_active_sites=n_active_sites,
    )
    key = jax.random.PRNGKey(0)
    params = model.init(key)

    t_spec = transform(target)

    def loss_fn(params):
        audio, boundary_diff = model.apply(params)
        recon_loss = jnp.abs(transform(audio) - t_spec).sum()
        continuity = jnp.abs(boundary_diff).sum() * boundary_weight
        return recon_loss + continuity

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        ok = jnp.isfinite(loss)
        params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_params, params
        )
        return params, new_opt, loss

    t0 = time.time()
    for i in range(n_iterations):
        params, opt_state, loss = step(params, opt_state)
        if i % 100 == 0:
            print(f"iter {i} loss {float(loss):.4f}")
    steps_per_sec = n_iterations / (time.time() - t0)
    print(f"{steps_per_sec:.2f} steps/sec")

    audio, _ = model.apply(params)
    audio = max_norm(audio)
    random_audio = model.apply(
        params, jax.random.PRNGKey(7), 0.001, method=OverfitControlPlane.random
    )
    rolled = model.apply(
        params,
        jax.random.PRNGKey(8),
        params["params"]["control"],
        method=OverfitControlPlane.rolled_control_plane,
    )

    if article_path:
        control = np.abs(
            np.asarray(params["params"]["control"]).reshape(
                control_plane_dim, -1
            )
        )
        conjure_article(
            article_path,
            "Playable State-Space Models From a Single Audio Sample",
            [
                AudioComponent(np.asarray(target[0, 0]), samplerate, "Original"),
                AudioComponent(np.asarray(audio[0, 0]), samplerate, "Reconstruction"),
                AudioComponent(
                    np.asarray(random_audio[0, 0]), samplerate,
                    "Random sparse control signal",
                ),
                AudioComponent(
                    np.asarray(rolled[0, 0]), samplerate,
                    "Permuted control plane",
                ),
                ImageComponent(control, "Learned control signal"),
            ],
            intro_markdown=(
                "# Playable state-space model\n"
                "An SSM 'instrument' extracted from one recording; the sparse "
                "control plane is the playable surface."
            ),
        )
        weights_path = article_path.replace(".html", "_weights.json")
        with open(weights_path, "w") as f:
            json.dump(generate_param_dict(params), f)
        print(f"article -> {article_path}; weights -> {weights_path}")

    return params, steps_per_sec


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=1000)
    parser.add_argument("--article", type=str, default=None)
    parser.add_argument("--audio-path", type=str, default=None)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args()
    kwargs = dict(n_iterations=args.iterations, article_path=args.article,
                  audio_path=args.audio_path)
    if args.tiny:
        kwargs.update(
            n_samples=2**13, window_size=64, control_plane_dim=16,
            state_dim=32, n_active_sites=64,
        )
    train_model_for_segment(**kwargs)

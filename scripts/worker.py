"""Synth-preset embedding worker (reference ``worker.py:32-500``):
polls a feed of synth presets, renders audio, embeds each render with the
trained encoder + a random projection, and posts index chunks to a
destination.

This environment has zero egress, so the feed/destination are pluggable:
the default implementation reads preset JSON files from a local inbox
directory and writes index chunks to an outbox (same dataclasses and flow
as the reference's HTTP/S3 worker; swap the transport for deployment).

Usage:
  python scripts/worker.py [--inbox DIR] [--outbox DIR] [--once] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from dataclasses import dataclass, asdict
from typing import List, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env
apply_platform_from_env()

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.models.siam import SIAMModel, siam_transform
from mptpu.models import OverfitControlPlane
from mptpu.train import CheckpointManager


@dataclass
class SynthPreset:
    """(reference ``worker.py:32-61`` dataclasses)"""

    preset_id: str
    synth: str
    params: dict


@dataclass
class IndexChunk:
    preset_id: str
    embedding: List[float]


def render_preset(preset: SynthPreset, n_samples: int, key) -> jnp.ndarray:
    """Render a preset to audio. Supports the 'ssm' synth (an
    OverfitControlPlane driven by the preset's control params) and falls
    back to filtered noise for unknown synths."""
    if preset.synth == "ssm":
        p = preset.params
        model = OverfitControlPlane(
            control_plane_dim=int(p.get("control_plane_dim", 16)),
            input_dim=int(p.get("window_size", 64)),
            state_matrix_dim=int(p.get("state_dim", 32)),
            n_samples=n_samples,
            window_size=int(p.get("window_size", 64)),
        )
        params = model.init(jax.random.fold_in(key, hash(preset.preset_id) % 2**31))
        audio, _ = model.apply(params)
        return audio.reshape(1, 1, n_samples)
    noise = jax.random.normal(key, (1, 1, n_samples)) * 0.1
    return noise


def make_embedder(model: SIAMModel, params, dim: int = 128, seed: int = 0):
    proj = jax.random.normal(
        jax.random.PRNGKey(seed), (model.context_dim * model.n_events, dim)
    ) / np.sqrt(model.context_dim * model.n_events)

    @jax.jit
    def embed(audio, key):
        channels, vecs, schedules = model.apply(params, audio, key)
        flat = vecs.reshape(1, -1)
        return (flat @ proj)[0]

    return embed


def run_worker(
    inbox: str,
    outbox: str,
    once: bool = False,
    tiny: bool = True,
    checkpoint_dir: Optional[str] = None,
    poll_seconds: float = 5.0,
):
    os.makedirs(inbox, exist_ok=True)
    os.makedirs(outbox, exist_ok=True)

    if tiny:
        model = SIAMModel(
            n_samples=2**12, context_dim=8, in_channels=257,
            hidden_channels=16, n_events=2,
            transform_window_size=512, transform_step_size=256,
            fft_resonance=True,
        )
    else:
        model = SIAMModel()

    key = jax.random.PRNGKey(0)
    example = jnp.zeros((1, 1, model.n_samples))
    params = None
    if checkpoint_dir:
        payload = CheckpointManager(checkpoint_dir).latest()
        if payload:
            params = payload["params"]
    if params is None:
        params = model.init(key, example, key)

    embed = make_embedder(model, params)

    while True:
        pending = sorted(
            f for f in os.listdir(inbox) if f.endswith(".json")
        )
        for fname in pending:
            path = os.path.join(inbox, fname)
            with open(path) as f:
                raw = json.load(f)
            preset = SynthPreset(**raw)
            audio = render_preset(preset, model.n_samples, key)
            emb = embed(audio, key)
            chunk = IndexChunk(
                preset_id=preset.preset_id,
                embedding=np.asarray(emb).tolist(),
            )
            out_path = os.path.join(outbox, f"{preset.preset_id}.json")
            with open(out_path, "w") as f:
                json.dump(asdict(chunk), f)
            os.remove(path)
            print(f"embedded {preset.preset_id} -> {out_path}")
        if once:
            break
        time.sleep(poll_seconds)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--inbox", type=str, default="worker_inbox")
    parser.add_argument("--outbox", type=str, default="worker_outbox")
    parser.add_argument("--once", action="store_true")
    parser.add_argument("--tiny", action="store_true", default=True)
    parser.add_argument("--checkpoint", type=str, default=None)
    args = parser.parse_args()
    run_worker(
        args.inbox, args.outbox, once=args.once, tiny=args.tiny,
        checkpoint_dir=args.checkpoint,
    )

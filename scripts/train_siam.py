"""SIAM iterative-decomposition trainer — the flagship entry point
(reference ``iterativedecomposition.py:377-647``).

Streams audio batches, runs the 32-step encode/generate loop, optimizes
the iterative (greedy energy-removal) loss, maintains the event-vector
reservoir for self-supervised previews, serves the live dashboard, and
checkpoints (params, opt_state, step).

Usage:
  python scripts/train_siam.py [--overfit] [--batch-size N] [--port 9999]
      [--save-weights] [--load-weights] [--iterations N] [--tiny]
"""

from __future__ import annotations

import argparse
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

from mptpu.data import AudioIterator
from mptpu.losses import iterative_loss
from mptpu.models.siam import SIAMModel, Reservoir, make_random_sequence_fn, make_iterative_fn, siam_transform
from mptpu.obs import Collection, serve_collection
from mptpu.parallel import make_mesh, make_data_parallel_step, batch_sharding
from mptpu.train import optimizer, CheckpointManager


def train_and_monitor(
    batch_size: int = 2,
    overfit: bool = False,
    port: int = 9999,
    save_weights: bool = False,
    load_weights: bool = False,
    iterations: int | None = None,
    tiny: bool = False,
    audio_path: str | None = None,
    data_parallel: bool = False,
    attn_floor: float = 0.0,
    attn_leak: float = 0.0,
    switch_clamp: float = 100.0,
    residual_clamp: float = 4.0,
    encoder_clamp: float = 1e4,
    log_every: int = 10,
    seed: int | None = None,
    selection_leak: float = 0.0,
):
    if selection_leak:
        # must happen before the model is built/jitted (trace-time knob)
        from mptpu.sparse.quantize import set_selection_leak
        set_selection_leak(selection_leak)

    if tiny:
        n_samples, n_events, hidden, context_dim = 2**13, 4, 32, 16
        window, step_sz = 512, 256
        in_channels = window // 2 + 1
    else:
        # reference hyperparams (iterativedecomposition.py:25-42)
        n_samples, n_events, hidden, context_dim = 2**17, 32, 128, 32
        window, step_sz = 2048, 256
        in_channels = window // 2 + 1

    model = SIAMModel(
        n_samples=n_samples,
        context_dim=context_dim,
        in_channels=in_channels,
        hidden_channels=hidden,
        n_events=n_events,
        transform_window_size=window,
        transform_step_size=step_sz,
        fft_resonance=True,
        attn_floor=attn_floor,
        attn_leak=attn_leak,
        # NaN-blowup guards (round-3 post-mortem, BENCHMARKS.md): no-ops
        # in the healthy regime, bound the switch-explosion cascade
        switch_clamp=switch_clamp,
        residual_clamp_scale=residual_clamp,
        encoder_clamp=encoder_clamp,
    )

    stream = AudioIterator(
        batch_size=batch_size,
        n_samples=n_samples,
        samplerate=22050,
        normalize=True,
        overfit=overfit,
        audio_path=audio_path,
        seed=seed,
    )

    collection = Collection(os.path.join("trained_weights", "siam_dashboard"))
    server = serve_collection(collection, port=port) if port else None

    key = jax.random.PRNGKey(0)
    example = jnp.zeros((batch_size, 1, n_samples))
    params = model.init(key, example, key)

    # the reference's SIAM run uses torch Adam DEFAULT betas
    # (iterativedecomposition.py:487) — not the (0, 0.9) GAN-style betas
    # of its other experiments; momentum matters here, without it the
    # first steps crush all event amplitudes to exact silence (a dead
    # local optimum of the energy-removal loss)
    # NOTE: LR warmup was tried here and made things WORSE — many small
    # early steps walk the whole decoder into exact silence (dead relu
    # selections) before useful-event gradients can compete. Full-rate
    # Adam with momentum escapes; --selection-leak is the safety net.
    opt = optimizer(lr=1e-4, b1=0.9, b2=0.999)
    opt_state = opt.init(params)
    ckpt = CheckpointManager("trained_weights/siam", every=100)
    reservoir = Reservoir(256, context_dim)
    random_seq = jax.jit(make_random_sequence_fn(model))

    start_iter = 0
    if load_weights:
        payload = ckpt.latest()
        if payload is not None:
            params = payload["params"]
            opt_state = payload["opt_state"] or opt_state
            start_iter = payload["step"]
            print(f"resumed from step {start_iter}")

    iterative = make_iterative_fn(model)  # scan-based: compiles ~n_events
                                          # times faster than the unrolled loop

    # reference second-half target fade (iterativedecomposition.py:519-524):
    # the encoder's mask hides the second half, so content there would
    # otherwise penalize every event and drive amplitudes toward silence
    fade = jnp.ones((1, 1, n_samples)).at[..., n_samples // 2 :].set(
        jnp.linspace(1.0, 0.0, n_samples // 2) ** 8
    )

    def loss_fn(params, target, key):
        channels, vecs, schedules, _ = iterative(params, target, key)
        # NOTE mag_epsilon smooths |z| but its gradient at exactly-silent
        # channels is still zero; escaping the silence optimum needs
        # --attn-floor + --attn-leak together (see BENCHMARKS.md)
        loss = iterative_loss(
            target * fade, channels,
            lambda x: siam_transform(x, window, step_sz, mag_epsilon=1e-6),
        )
        return loss, (channels, vecs)

    mesh = None
    if data_parallel and len(jax.devices()) > 1:
        # batch-sharded inputs, replicated params; XLA inserts the grad
        # all-reduce over the ICI (SURVEY.md §2.6 TPU-native plan)
        mesh = make_mesh(axis_names=("data",))
        shard = batch_sharding(mesh)

    @jax.jit
    def train_step(params, opt_state, target, key):
        (loss, (channels, vecs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, target, key)
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # a finite loss with NaN grads silently poisons params — guard both
        ok = jnp.isfinite(loss) & jnp.isfinite(optax.global_norm(grads))
        params_out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_params, params
        )
        opt_out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_opt, opt_state
        )
        return params_out, opt_out, loss, channels, vecs

    losses = []
    for i, item in enumerate(iter(stream), start=start_iter):
        if iterations is not None and i >= iterations:
            break
        k = jax.random.fold_in(key, i)
        t0 = time.time()
        if mesh is not None:
            item = jax.device_put(item, shard)
        params, opt_state, loss, channels, vecs = train_step(
            params, opt_state, item, k
        )
        # logging forces device->host transfers; keep it periodic so the
        # accelerator stays busy
        if i % log_every == 0:
            loss = float(loss)
            losses.append(loss)
            elapsed = time.time() - t0
            print(f"iter {i} loss {loss:.4f} ({elapsed:.2f}s)", flush=True)
            reservoir.update(np.asarray(vecs))
            collection.log("orig", np.asarray(item[0, 0]), kind="audio")
            recon = np.asarray(jnp.sum(channels, axis=1)[0])
            collection.log("recon", recon, kind="audio")
            collection.log("loss", np.asarray(losses[-200:]))

        if i % 100 == 0 and i > 0:
            # self-supervised preview from reservoir-sampled vectors
            rvecs = jnp.asarray(reservoir.sample(1, n_events))
            rand_audio, _, _ = random_seq(params, rvecs, k)
            collection.log(
                "random", np.asarray(jnp.sum(rand_audio, axis=1)[0]), kind="audio"
            )

        if save_weights:
            ckpt.maybe_save(i, params, opt_state)

    if server:
        server.shutdown()
    return params, losses


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--overfit", action="store_true")
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--port", type=int, default=9999)
    parser.add_argument("--save-weights", action="store_true")
    parser.add_argument("--load-weights", action="store_true")
    parser.add_argument("--iterations", type=int, default=None)
    parser.add_argument("--tiny", action="store_true",
                        help="small config for smoke testing")
    parser.add_argument("--audio-path", type=str, default=None)
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the batch over all devices")
    parser.add_argument("--attn-floor", type=float, default=0.0,
                        help="amplitude floor keeping event gradients alive")
    parser.add_argument("--switch-clamp", type=float, default=100.0,
                        help="straight-through cap on the event-switch "
                             "amplitude (0 = exact reference semantics)")
    parser.add_argument("--residual-clamp", type=float, default=4.0,
                        help="residual-carry clip as a multiple of "
                             "max|initial spec| (0 = exact reference)")
    parser.add_argument("--encoder-clamp", type=float, default=1e4,
                        help="per-block activation clip in the gated "
                             "encoder stack (0 = exact reference)")
    parser.add_argument("--attn-leak", type=float, default=0.0,
                        help="straight-through leaky backward for the attention\n"
                             "relu (forward stays exact reference relu)")
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument("--selection-leak", type=float, default=0.0,
                        help="leaky-relu slope for relu item selections; keeps\n"
                             "gradients alive if every selection goes negative")
    parser.add_argument("--seed", type=int, default=None,
                        help="data seed; with --overfit pins the segment so a\n"
                             "report can be generated on the same audio")
    args = parser.parse_args()
    train_and_monitor(
        batch_size=args.batch_size,
        overfit=args.overfit,
        port=args.port,
        save_weights=args.save_weights,
        load_weights=args.load_weights,
        iterations=args.iterations,
        tiny=args.tiny,
        audio_path=args.audio_path,
        data_parallel=args.data_parallel,
        attn_floor=args.attn_floor,
        attn_leak=args.attn_leak,
        switch_clamp=args.switch_clamp,
        residual_clamp=args.residual_clamp,
        encoder_clamp=args.encoder_clamp,
        log_every=args.log_every,
        seed=args.seed,
        selection_leak=args.selection_leak,
    )

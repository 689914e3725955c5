"""Rate/distortion of the SIAM codec's WIRE format on a trained overfit
checkpoint: quantize each event tuple to what would actually be
transmitted, decode from the dequantized tuples alone (open-loop, same
per-event noise keys), and report kbps + SNR next to the float encode.

The reference's product claim is a sparse *event-tuple* codec
(``v3blogpost.py:59-93``: 32 events explain a ~6 s segment); this script
puts a number on the implied bitrate. Wire layout per event:

  preset f16:  context vec (C x f16) | frame idx u16 | amp f16
  preset int8: context vec (C x i8 + 1 f16 scale) | frame idx u16 | amp f16
  (+ shift i16 | gain f16 when --refine — the encode-time MP alignment
   corrections, mptpu/models/siam.py:refine_event_alignment)

Decode reproduces training noise exactly: event i renders with
``fold_in(PRNGKey(42), i)`` (the --fixed-noise training convention,
scripts/siam_overfit.py:311).

Run in the background to completion (never under ``timeout``).
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env, enable_compilation_cache
apply_platform_from_env()
enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.models.siam import (
    SIAMModel,
    fade_tail,
    make_iterative_fn,
    refine_event_alignment,
)
from mptpu.train.checkpoint import load_checkpoint
from mptpu.utils.wav import write_wav

SAMPLE_RATE = 22050
NOISE_KEY = jax.random.PRNGKey(42)


def quantize_events(vecs, schedules, preset):
    """(vecs, schedules) -> (dequantized vecs, dequantized schedules,
    wire bytes per event). Schedules go on the wire as (argmax frame,
    peak amplitude); decode places a hard impulse there."""
    b, e, c = vecs.shape
    n_frames = schedules.shape[-1]
    idx = jnp.argmax(schedules, axis=-1)                       # (b, e)
    amp = jnp.take_along_axis(schedules, idx[..., None], axis=-1)
    amp16 = amp.astype(jnp.float16).astype(jnp.float32)
    sched_q = (
        jax.nn.one_hot(idx, n_frames, dtype=jnp.float32) * amp16
    )
    if preset == "f16":
        vecs_q = vecs.astype(jnp.float16).astype(jnp.float32)
        vec_bytes = 2 * c
    elif preset == "int8":
        scale = jnp.maximum(jnp.max(jnp.abs(vecs), axis=-1, keepdims=True),
                            1e-12)
        q = jnp.clip(jnp.round(vecs / scale * 127.0), -127, 127)
        vecs_q = q / 127.0 * scale.astype(jnp.float16).astype(jnp.float32)
        vec_bytes = c + 2  # int8 lanes + one f16 scale
    else:
        raise ValueError(preset)
    return vecs_q, sched_q, vec_bytes + 2 + 2  # + frame u16 + amp f16


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", type=str,
                   default="trained_weights/siam_overfit_full_sw3")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--selection-leak", type=float, default=0.02)
    p.add_argument("--selection-floor", type=float, default=0.02)
    p.add_argument("--attn-floor", type=float, default=0.01)
    p.add_argument("--attn-leak", type=float, default=0.1)
    p.add_argument("--switch-clamp", type=float, default=20.0)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--n-samples-log2", type=int, default=17)
    p.add_argument("--n-events", type=int, default=32)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--context-dim", type=int, default=32)
    p.add_argument("--audio-events", type=int, default=0)
    p.add_argument("--stream-windows", type=int, default=1,
                   help="rebuild the trainer's longer segment; the rate "
                        "demo encodes its FIRST window")
    p.add_argument("--refine", type=int, default=256,
                   help="carry shift+gain corrections on the wire, "
                        "refined within this many samples (0 = off). "
                        "NOTE these corrections are the only part of "
                        "the r3 wire format with positive SNR (raw "
                        "wire decode was -0.147 dB); the JSON flags "
                        "refine_required accordingly")
    p.add_argument("--walk", action="store_true",
                   help="ALSO encode the FULL segment through the "
                        "default streaming walk (time-domain residual "
                        "handoff) and report whole-segment kbps vs "
                        "SNR/LSD/PIF with delta-coded event times — "
                        "the rate/distortion of the codec as deployed "
                        "(the first-window table covers only "
                        "covered_span_s of the segment)")
    p.add_argument("--watchdog-s", type=int, default=3000)
    args = p.parse_args()

    faulthandler.dump_traceback_later(args.watchdog_s, exit=True)

    # Defaults that describe the SEGMENT must match the checkpoint's
    # training config or the scores are against the wrong audio (a
    # default invocation against sw3 silently rebuilt a 47-event
    # single-window segment for a 12-event 3-window checkpoint; ADVICE
    # r3). The trainer records its config line in metrics.json — read
    # it and fill in any argument the user left at its parser default;
    # warn if an explicit argument contradicts the recorded config.
    import re
    cfg_path = os.path.join(args.run, "metrics.json")
    cfg = ""
    if os.path.exists(cfg_path):
        try:
            with open(cfg_path) as f:
                cfg = json.load(f).get("config", "")
        except (IOError, ValueError):
            cfg = ""
        recorded = {}
        m = re.search(r"seed (\d+)", cfg)
        if m:
            recorded["seed"] = int(m.group(1))
        m = re.search(r"n_samples 2\^(\d+)", cfg)
        if m:
            recorded["n_samples_log2"] = int(m.group(1))
        m = re.search(r"(\d+) events", cfg)
        if m:
            recorded["n_events"] = int(m.group(1))
        m = re.search(r"audio_events (\d+)", cfg)
        if m:
            recorded["audio_events"] = int(m.group(1))
        m = re.search(r"stream_windows (\d+)", cfg)
        if m:
            recorded["stream_windows"] = int(m.group(1))
        for name, val in recorded.items():
            cur = getattr(args, name)
            if cur == p.get_default(name):
                if cur != val:
                    setattr(args, name, val)
                    print(f"[config] --{name.replace('_', '-')} <- {val} "
                          f"(from {cfg_path})", flush=True)
            elif cur != val:
                print(f"WARNING: --{name.replace('_', '-')}={cur} "
                      f"contradicts the run's recorded config ({val}); "
                      "scoring against a different segment than the "
                      "checkpoint was fit to", flush=True)

    if args.selection_leak or args.selection_floor:
        from mptpu.sparse.quantize import (
            set_selection_leak, set_selection_floor,
        )
        set_selection_leak(args.selection_leak)
        set_selection_floor(args.selection_floor)

    n_samples = 2 ** args.n_samples_log2
    half = n_samples // 2
    window, step_sz = 2048, 256
    if os.path.exists(cfg_path) and cfg:
        m = re.search(r"STFT (\d+)/(\d+)", cfg)
        if m:
            window, step_sz = int(m.group(1)), int(m.group(2))
    # capacity heuristic tied to scale (the trainers' own mapping;
    # the config line does not record hidden/context): medium 2^15 ->
    # 64/32, full 2^17 -> 128/32
    if args.n_samples_log2 == 15 and args.hidden == p.get_default("hidden"):
        args.hidden = 64
    # round-5 conditioning flags: a checkpoint trained with them has
    # extra params AND different encode semantics, so they must come
    # from the recorded config (the ADVICE-r3 lesson)
    spectral_skip = "spectral_skip True" in cfg
    spectral_filter = "spectral_filter True" in cfg
    model = SIAMModel(
        n_samples=n_samples, context_dim=args.context_dim,
        in_channels=window // 2 + 1, hidden_channels=args.hidden,
        n_events=args.n_events, transform_window_size=window,
        transform_step_size=step_sz, fft_resonance=True,
        attn_floor=args.attn_floor, attn_leak=args.attn_leak,
        switch_clamp=args.switch_clamp, residual_clamp_scale=4.0,
        encoder_clamp=1e4,
        spectral_skip=spectral_skip, spectral_filter=spectral_filter,
    )

    # the exact segment the checkpoint was fit to (overfit_stream_eval's
    # construction), first window only
    from mptpu.data.synthetic import synthetic_audio
    n_win = max(1, args.stream_windows)
    total_len = n_samples + (n_win - 1) * half
    base_events = args.audio_events or int(n_samples / SAMPLE_RATE * 8)
    seg = synthetic_audio(
        total_len, SAMPLE_RATE,
        n_events=int(round(base_events * total_len / n_samples)),
        seed=args.seed, sustained=True)
    target = jnp.asarray(seg).reshape(1, 1, total_len)[..., :n_samples]
    # ENCODE the fade-tailed window: the trainer always encodes
    # faded_target (scripts/siam_overfit.py — the window's second half
    # is faded because the streaming mask confines events to the first
    # half), so an unfaded tail is out-of-distribution for the encoder.
    # This is the codec's analysis-window convention, applied by the
    # encoder at encode time (it has the audio) — zero rate cost, and
    # scoring below stays against the UNfaded target's first half,
    # where the fade multiplier is identically 1.
    enc_input = target * fade_tail(n_samples)

    ckpt_path = args.ckpt
    if ckpt_path is None:
        # prefer the EMA-best snapshot: the last ckpt_* can postdate a
        # late-run divergence storm (run sw3's final checkpoint scored
        # 5 dB below its EMA best)
        ema = os.path.join(args.run, "ema_best.pkl")
        if os.path.exists(ema):
            ckpt_path = ema
        else:
            cands = sorted(
                f for f in os.listdir(args.run)
                if f.startswith("ckpt_") and f.endswith(".pkl")
            )
            if not cands:
                sys.exit(f"no checkpoint (.pkl) in {args.run} — the run "
                         "dir may hold only whitelisted artifacts "
                         "(wav/json); pass --ckpt explicitly")
            ckpt_path = os.path.join(args.run, cands[-1])
    payload = load_checkpoint(ckpt_path)
    if payload is None:
        sys.exit(f"no loadable checkpoint at {ckpt_path} — the run "
                 "dir may hold only whitelisted artifacts (wav/json);"
                 " pass --ckpt explicitly")
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    print(f"loaded {ckpt_path} (step {payload['step']})", flush=True)

    iterative = jax.jit(make_iterative_fn(model))
    channels, vecs, schedules, _ = iterative(params, enc_input, NOISE_KEY)
    recon_raw = jnp.sum(channels, axis=1, keepdims=True)
    _ = float(recon_raw.sum())

    # open-loop decode from dequantized tuples, training-noise keys
    generate = jax.jit(
        lambda p, v, s, k: model.apply(p, v, s, k, method=SIAMModel.generate)
    )

    def decode(vecs_q, sched_q):
        outs = [
            generate(params, vecs_q[:, i: i + 1], sched_q[:, i: i + 1],
                     jax.random.fold_in(NOISE_KEY, i))
            for i in range(args.n_events)
        ]
        return jnp.concatenate(outs, axis=1)

    def snr(t, r):
        return float(10 * jnp.log10(
            jnp.maximum(jnp.sum(t ** 2), 1e-12)
            / jnp.maximum(jnp.sum((t - r) ** 2), 1e-12)))

    wire_seconds = half / SAMPLE_RATE  # streaming walk: half fresh/window
    pcm_kbps = SAMPLE_RATE * 16 / 1000.0
    out = {
        "ckpt": ckpt_path,
        "n_events": args.n_events,
        "covered_span_s": round(wire_seconds, 3),
        "raw_first_half_snr_db": round(
            snr(target[..., :half], recon_raw[..., :half]), 3),
        "pcm_kbps": round(pcm_kbps, 1),
        "presets": {},
    }
    for preset in ("f16", "int8"):
        vecs_q, sched_q, ev_bytes = quantize_events(vecs, schedules, preset)
        if args.refine:
            ev_bytes += 2 + 2  # shift i16 + gain f16
        ch_q = decode(vecs_q, sched_q)
        recon_q = jnp.sum(ch_q, axis=1, keepdims=True)
        row = {
            "bytes_per_event": ev_bytes,
            "bytes_per_window": ev_bytes * args.n_events,
            "kbps": round(ev_bytes * args.n_events * 8
                          / wire_seconds / 1000.0, 3),
            "compression_vs_pcm": round(
                pcm_kbps / (ev_bytes * args.n_events * 8
                            / wire_seconds / 1000.0), 1),
            "wire_first_half_snr_db": round(
                snr(target[..., :half], recon_q[..., :half]), 3),
        }
        if args.refine:
            # encode-time corrections vs the ORIGINAL (in hand at encode),
            # then quantized like everything else on the wire
            refined, shifts, gains = refine_event_alignment(
                target[..., :half], ch_q[..., :half],
                max_shift=args.refine)
            gains16 = gains.astype(jnp.float16).astype(jnp.float32)
            n = ch_q.shape[-1]
            idxs = (jnp.arange(n)[None, None, :]
                    - shifts[..., None].astype(jnp.int32)) % n
            ch_shifted = jnp.take_along_axis(ch_q, idxs, axis=-1)
            recon_ref = jnp.einsum("be,ben->bn", gains16, ch_shifted)[
                :, None]
            row["refined_first_half_snr_db"] = round(
                snr(target[..., :half], recon_ref[..., :half]), 3)
            # an honest wire format must say when the shift+gain
            # refinement is load-bearing rather than a polish pass
            # (ADVICE r3: r3's raw wire decode was BELOW 0 dB and the
            # headline kbps/SNR pair quoted the refined number)
            row["refine_required"] = bool(
                row["wire_first_half_snr_db"] < 1.0
            )
            if preset == "f16":
                write_wav(os.path.join(args.run, "recon_wire_f16.wav"),
                          np.asarray(recon_ref[0, 0]), SAMPLE_RATE)
        out["presets"][preset] = row

    if args.walk:
        # ---- full-segment rate/distortion through the DEFAULT walk
        # (VERDICT r3 item 7: the first-window table covers only
        # covered_span_s of the segment). Event times go on the wire
        # delta-coded in GLOBAL frame order — the walk form of the
        # reference's local<->global event-tuple transforms
        # (modules/multibanddict.py:189-235)
        from mptpu.models.siam import make_streaming_fn, siam_transform
        from mptpu.perceptual import pif_distance

        n_win = max(1, args.stream_windows)
        total_len = n_samples + (n_win - 1) * half
        walk_target = jnp.asarray(seg).reshape(1, 1, total_len)
        walk_target = walk_target.at[..., total_len - half:].multiply(
            jnp.linspace(1.0, 0.0, half) ** 8)
        padded = jnp.pad(walk_target, ((0, 0), (0, 0), (0, n_samples)))
        stream = make_streaming_fn(model)
        _, w_vecs, w_times, _ = stream(
            params, padded, NOISE_KEY, fixed_noise=True,
            return_event_vectors=True,
        )
        n_windows = w_vecs.shape[1] // args.n_events
        frame_step = model.n_frames // 2
        duration_s = total_len / SAMPLE_RATE

        def lsd(t, r):
            ts = siam_transform(t, window, step_sz)
            rs = siam_transform(r, window, step_sz)
            return float(jnp.sqrt(jnp.mean(
                (20 * jnp.log10(ts + 1e-8)
                 - 20 * jnp.log10(rs + 1e-8)) ** 2)))

        pif = jax.jit(pif_distance)
        out["walk"] = {
            "n_windows": int(n_windows),
            "duration_s": round(duration_s, 3),
            "presets": {},
        }
        for preset in ("f16", "int8"):
            tracks = jnp.zeros(
                (1, n_windows * args.n_events, total_len + n_samples)
            )
            global_frames = []
            for wi in range(n_windows):
                sl = slice(wi * args.n_events, (wi + 1) * args.n_events)
                vq, sq, ev_bytes = quantize_events(
                    w_vecs[:, sl], w_times[:, sl], preset)
                ch_q = decode(vq, sq)
                off = wi * frame_step * step_sz
                seg_buf = jax.lax.dynamic_update_slice(
                    jnp.zeros((1, args.n_events, total_len + n_samples)),
                    ch_q, (0, 0, off))
                tracks = tracks.at[:, sl].set(seg_buf)
                global_frames.extend(
                    (wi * frame_step
                     + np.asarray(jnp.argmax(w_times[:, sl], axis=-1))[0]
                     ).tolist())
            tracks = tracks[..., :total_len]
            raw_recon = jnp.sum(tracks, axis=1, keepdims=True)
            # delta-coded global times: sort ascending, first-order
            # empirical entropy of the deltas = the entropy-coded size
            deltas = np.diff(np.sort(np.asarray(global_frames)))
            if len(deltas):
                vals, counts = np.unique(deltas, return_counts=True)
                probs = counts / counts.sum()
                bits_per_delta = float(-(probs * np.log2(probs)).sum())
            else:
                bits_per_delta = 0.0
            n_ev_total = n_windows * args.n_events
            time_bytes_entropy = (
                2 + (n_ev_total - 1) * bits_per_delta / 8.0
            )  # first time as u16 + entropy-coded deltas
            fixed_bytes = ev_bytes * n_ev_total
            if args.refine:
                fixed_bytes += 4 * n_ev_total  # shift i16 + gain f16
            # swap the fixed u16 times for the entropy-coded stream
            entropy_bytes = (
                fixed_bytes - 2 * n_ev_total + time_bytes_entropy
            )
            row = {
                "events_total": int(n_ev_total),
                "kbps_fixed": round(
                    fixed_bytes * 8 / duration_s / 1000.0, 3),
                "kbps_entropy_times": round(
                    entropy_bytes * 8 / duration_s / 1000.0, 3),
                "time_bits_per_event_entropy": round(bits_per_delta, 2),
                "wire_full_snr_db": round(snr(walk_target, raw_recon), 3),
                "wire_full_lsd_db": round(lsd(walk_target, raw_recon), 3),
                "wire_full_pif_dist": round(
                    float(pif(walk_target, raw_recon)), 4),
            }
            if args.refine:
                refined, shifts, gains = refine_event_alignment(
                    walk_target, tracks, max_shift=args.refine)
                gains16 = gains.astype(jnp.float16).astype(jnp.float32)
                recon_ref = jnp.einsum(
                    "be,ben->bn", gains16, refined)[:, None]
                row["refined_full_snr_db"] = round(
                    snr(walk_target, recon_ref), 3)
                row["refined_full_lsd_db"] = round(
                    lsd(walk_target, recon_ref), 3)
                row["refined_full_pif_dist"] = round(
                    float(pif(walk_target, recon_ref)), 4)
                row["refine_required"] = bool(
                    row["wire_full_snr_db"] < 1.0)
                if preset == "f16":
                    write_wav(
                        os.path.join(args.run, "recon_wire_walk_f16.wav"),
                        np.asarray(recon_ref[0, 0]), SAMPLE_RATE)
            out["walk"]["presets"][preset] = row

    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(args.run, "codec_rate.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

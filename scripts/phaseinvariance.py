"""Phase-invariant feature study (reference ``phaseinvariance.py``):
what do different audio transforms "hear"? Overfit RAW AUDIO SAMPLES to
match the transform of a target; transforms that discard imperceptible
phase recover perceptually-faithful audio even when the waveform (and
its SNR) diverges.

Transforms compared (reference ``phaseinvariance.py:130-155``):
  - magnitude STFT, 512/256
  - magnitude STFT, 2048/256 (longer windows, better reconstruction)
  - AIM-like feature (gammatone filterbank -> rectify -> windowed
    periodicity magnitudes)

For each transform this reports final transform-space loss, waveform
SNR, and log-spectral distance — quantifying the article's qualitative
claim. Renders ``report.html`` with audio via mptpu.obs. No MusicNet in
the image, so the target is a synthetic segment."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env
apply_platform_from_env()

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.ops.stft import stft
from mptpu.perceptual.aim import auditory_image_model
from mptpu.perceptual.gammatone import gammatone_filter_bank
from mptpu.train.overfit import overfit_model
from mptpu.utils.wav import write_wav


def snr_db(target, recon):
    return float(
        10.0
        * jnp.log10(
            jnp.maximum(jnp.sum(target**2), 1e-12)
            / jnp.maximum(jnp.sum((target - recon) ** 2), 1e-12)
        )
    )


def lsd_db(target, recon):
    ts = stft(target, 2048, 256, pad=True)
    rs = stft(recon, 2048, 256, pad=True)
    return float(
        jnp.sqrt(
            jnp.mean(
                (20 * jnp.log10(ts + 1e-8) - 20 * jnp.log10(rs + 1e-8)) ** 2
            )
        )
    )


def reconstruct_with_transform(target, transform, iterations, lr=1e-2):
    """Overfit a raw-audio parameter tensor so transform(recon) matches
    transform(target) (reference ``phaseinvariance.py:113-127`` /
    ``OverfitRawAudio``)."""
    real_repr = transform(target)

    def loss_fn(params, tgt, key):
        return jnp.mean((transform(params["audio"]) - real_repr) ** 2)

    init = {
        "audio": jax.random.uniform(
            jax.random.PRNGKey(0), target.shape, minval=-1e-3, maxval=1e-3
        )
    }
    params, losses = overfit_model(
        init, loss_fn, target, n_iterations=iterations, lr=lr
    )
    return params["audio"], losses


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=1000)
    p.add_argument("--n-samples", type=int, default=2**17)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="trained_weights/phaseinvariance")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if args.smoke:
        args.n_samples, args.iterations = 2**13, 50

    from mptpu.data.synthetic import synthetic_audio

    samplerate = 22050
    seg = synthetic_audio(
        args.n_samples, samplerate,
        n_events=max(4, int(args.n_samples / samplerate * 8)),
        seed=args.seed, sustained=True,
    )
    target = jnp.asarray(seg).reshape(1, 1, -1)
    write_wav(os.path.join(args.out, "source.wav"), seg, samplerate)

    fb = gammatone_filter_bank(
        n_filters=128, size=256, band_spacing="geometric"
    )

    experiments = {
        "mag_spec_512": lambda x: stft(x, 512, 256, pad=True),
        "mag_spec_2048": lambda x: stft(x, 2048, 256, pad=True),
        "aim": lambda x: auditory_image_model(x, fb, 256, 64),
    }

    results = {}
    for name, transform in experiments.items():
        recon, losses = reconstruct_with_transform(
            target, transform, args.iterations
        )
        entry = {
            "final_loss": losses[-1],
            "snr_db": round(snr_db(target, recon), 3),
            "lsd_db": round(lsd_db(target, recon), 3),
        }
        results[name] = entry
        print(name, json.dumps(entry), flush=True)
        write_wav(
            os.path.join(args.out, f"recon_{name}.wav"),
            np.asarray(recon[0, 0]), samplerate,
        )

    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(results, f, indent=1)

    from mptpu.utils.reporting import audio_element, html_page

    sections = [
        (
            "Source",
            audio_element(seg, samplerate, "source")
            + "<p>The audio every transform below tries to recover.</p>",
        )
    ]
    from mptpu.utils.wav import read_wav

    for name, r in results.items():
        audio, sr = read_wav(os.path.join(args.out, f"recon_{name}.wav"))
        sections.append(
            (
                name,
                audio_element(audio, sr, name)
                + f"<p>transform loss {r['final_loss']:.3e}, waveform SNR "
                f"{r['snr_db']} dB, LSD {r['lsd_db']} dB — phase-invariant "
                "features recover audible structure without matching the "
                "waveform.</p>",
            )
        )
    with open(os.path.join(args.out, "report.html"), "w") as f:
        f.write(html_page("Phase-invariant features", sections))
    print("done", flush=True)


if __name__ == "__main__":
    main()

"""Phase codec (invertible mag/IF spectrogram) tests."""

import numpy as np
import jax.numpy as jnp

from mptpu.ops import AudioCodec, windowed_audio


def test_codec_round_trip_high_snr():
    codec = AudioCodec(512, 256)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    spec = codec.to_frequency_domain(x)
    assert spec.shape == (1, 16, 257, 2)
    recon = codec.to_time_domain(spec)
    a = np.asarray(x)[0, 512:3500]
    b = np.asarray(recon)[0, 0, 512:3500]
    snr = 10 * np.log10(np.sum(a**2) / np.sum((a - b) ** 2))
    assert snr > 60, f"round-trip SNR too low: {snr:.1f} dB"


def test_windowed_audio_shapes():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32))
    w = windowed_audio(x, 256, 128)
    assert w.shape[0] == 2 and w.shape[-1] == 256

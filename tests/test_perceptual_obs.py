"""Perceptual front-ends + observability layer tests."""

import json
import os
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

RNG = np.random.default_rng(0)


class TestPerceptual:
    def test_gammatone_bank(self):
        from mptpu.perceptual import gammatone_filter_bank

        bank = gammatone_filter_bank(8, 64, samplerate=22050)
        assert bank.shape == (8, 64)
        np.testing.assert_allclose(
            np.abs(np.asarray(bank)).max(axis=-1), 1.0, rtol=1e-5
        )

    def test_aim_shapes(self):
        from mptpu.perceptual import gammatone_filter_bank, auditory_image_model

        bank = gammatone_filter_bank(4, 64)
        sig = jnp.asarray(RNG.standard_normal((1, 1, 1024)).astype(np.float32))
        aim = auditory_image_model(sig, bank, 128, 64)
        assert aim.shape[0] == 1 and aim.shape[1] == 4
        assert aim.shape[-1] == 65

    def test_pif_shapes(self):
        from mptpu.perceptual import fft_based_pif

        sig = jnp.asarray(RNG.standard_normal((2, 1, 2048)).astype(np.float32))
        out = fft_based_pif(sig, 64, 32)
        assert out.shape[0] == 2
        assert np.isfinite(np.asarray(out)).all()

    def test_scattering(self):
        from mptpu.perceptual import scattering_transform, morlet_filter_bank, mel_scale_hz

        bank = jnp.asarray(
            morlet_filter_bank(22050, 64, mel_scale_hz(20, 11000, 6), 0.1).real.astype(
                np.float32
            )
        )
        sig = jnp.asarray(RNG.standard_normal((1, 1024)).astype(np.float32))
        c1, c2 = scattering_transform(sig, bank, window_size=64, step_size=32)
        assert c1.shape[0] == 1 and c2.shape[0] == 1
        assert np.isfinite(np.asarray(c1)).all()

    def test_more_correct_scattering(self):
        from mptpu.perceptual import MoreCorrectScattering, mel_scale_hz

        m = MoreCorrectScattering(22050, mel_scale_hz(20, 11000, 6), 64)
        sig = jnp.asarray(RNG.standard_normal((1, 1, 1024)).astype(np.float32))
        out = m(sig)
        assert out.shape[0] == 1
        assert np.isfinite(np.asarray(out)).all()

    def test_psychoacoustic_loss(self):
        from mptpu.perceptual import PsychoacousticFeature

        pf = PsychoacousticFeature(n_bands=8)
        a = jnp.asarray(RNG.standard_normal((1, 1, 16384)).astype(np.float32))
        b = jnp.asarray(RNG.standard_normal((1, 1, 16384)).astype(np.float32))
        same = float(pf.loss(a, a))
        diff = float(pf.loss(a, b))
        assert same < 1e-9
        assert diff > same

    def test_cochlea_model(self):
        from mptpu.perceptual import cochlea_filter_bank, cochlea_model

        bank = cochlea_filter_bank(8, 64)
        sig = jnp.asarray(RNG.standard_normal((1, 1, 1024)).astype(np.float32))
        out = cochlea_model(sig, bank)
        assert out.shape == (1, 8, 1024)
        assert float(jnp.min(out)) >= 0  # rectified + sqrt


class TestObs:
    def test_collection_and_loggers(self, tmp_path):
        from mptpu.obs import Collection, loggers

        c = Collection(str(tmp_path / "coll"))
        (log_audio,) = loggers(["recon"], "audio/wav", c)
        log_audio(np.sin(np.linspace(0, 100, 22050)))
        assert "recon" in c.names()
        assert c.meta("recon")["kind"] == "audio"
        wav_bytes = bytes(c.latest("recon"))
        assert wav_bytes[:4] == b"RIFF"

        c.log("loss", np.asarray([1.0, 0.5, 0.25]))
        np.testing.assert_allclose(
            np.asarray(c.latest("loss")), [1.0, 0.5, 0.25]
        )

    def test_dashboard_server(self, tmp_path):
        from mptpu.obs import Collection, serve_collection

        c = Collection(str(tmp_path / "dash"))
        c.log("loss", np.asarray([3.0, 2.0]))
        server = serve_collection(c, port=19999)
        try:
            names = json.loads(
                urllib.request.urlopen(
                    "http://127.0.0.1:19999/api/names", timeout=5
                ).read()
            )
            assert names == ["loss"]
            value = json.loads(
                urllib.request.urlopen(
                    "http://127.0.0.1:19999/api/value/loss", timeout=5
                ).read()
            )
            assert value["data"] == [3.0, 2.0]
            page = urllib.request.urlopen(
                "http://127.0.0.1:19999/", timeout=5
            ).read()
            assert b"dashboard" in page
        finally:
            server.shutdown()

    def test_article_export(self, tmp_path):
        from mptpu.obs import conjure_article, AudioComponent, ImageComponent

        path = str(tmp_path / "article.html")
        conjure_article(
            path,
            "Test Article",
            [
                AudioComponent(np.sin(np.linspace(0, 100, 4096)), title="sound"),
                ImageComponent(RNG.random((32, 64)), title="spec"),
            ],
            intro_markdown="# Hello\nSome text.",
        )
        html = open(path).read()
        assert "data:audio/wav;base64" in html
        assert "<svg" in html
        assert "Test Article" in html


class TestPointcloudSearch:
    def test_canonical_ordering(self):
        from mptpu.models import CanonicalOrdering

        x = jnp.asarray(RNG.standard_normal((2, 5, 4)).astype(np.float32))
        ordering = CanonicalOrdering(4)
        out = ordering(x)
        assert out.shape == x.shape
        z = np.asarray(x @ ordering.projection)[..., 0]
        zo = np.asarray(out @ ordering.projection)[..., 0]
        assert (np.diff(zo, axis=1) >= -1e-6).all()

    def test_graph_edge_embedding(self):
        from mptpu.models import GraphEdgeEmbedding

        g = GraphEdgeEmbedding(n_items=5, embedding_dim=4, out_channels=8)
        x = jnp.asarray(RNG.standard_normal((2, 5, 4)).astype(np.float32))
        out = g(x)
        assert out.shape == (2, 8)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-4
        )
        # permutation invariance via canonical ordering
        perm = x[:, ::-1, :]
        np.testing.assert_allclose(
            np.asarray(g(perm)), np.asarray(out), rtol=1e-4, atol=1e-5
        )

    def test_brute_force_search(self):
        from mptpu.models import BruteForceSearch

        emb = jnp.asarray(RNG.standard_normal((20, 8)).astype(np.float32))
        keys = [f"k{i}" for i in range(20)]
        search = BruteForceSearch(emb, keys, n_results=3)
        found, vecs = search.search(emb[7])
        assert found[0] == "k7"
        assert len(found) == 3
        viz = search.visualization()
        assert viz.shape == (20, 2)


class TestPifDistance:
    def test_pif_distance_bounds_and_invariance(self):
        """pif_distance (mptpu/perceptual/distance.py) is the eval-side
        perceptual metric (VERDICT r3 item 6): 0 for identity, exactly
        1 for a silent recon of non-silent audio, bounded by 1 always
        (symmetric denominator), and far more forgiving of a small
        circular shift (inaudible phase) than of independent content."""
        import jax
        from mptpu.perceptual import pif_distance

        k = jax.random.PRNGKey(0)
        a = jax.random.normal(k, (1, 1, 4096)) * 0.1
        assert float(pif_distance(a, a)) == 0.0
        assert abs(float(pif_distance(a, jnp.zeros_like(a))) - 1.0) < 1e-6
        # silent target AND near-silent recon: bounded, not an explosion
        # (the one-sided denominator measured ~1.8e9 here)
        tiny = jax.random.normal(k, (1, 1, 4096)) * 1e-6
        assert float(pif_distance(jnp.zeros_like(a), tiny)) <= 1.0 + 1e-6
        rolled = float(pif_distance(a, jnp.roll(a, 7, axis=-1)))
        other = float(
            pif_distance(
                a, jax.random.normal(jax.random.PRNGKey(1), (1, 1, 4096)) * 0.1
            )
        )
        assert rolled < 0.6 * other
        # waveform SNR, for contrast, treats the rolled copy as near-
        # total destruction — the point of a phase-invariant metric
        snr = 10 * jnp.log10(
            jnp.sum(a**2) / jnp.sum((a - jnp.roll(a, 7, axis=-1)) ** 2)
        )
        assert float(snr) < 3.0

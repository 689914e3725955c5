"""Round-5 generalization levers: spectral_skip / spectral_filter
(mptpu/models/siam.py; motivated by trained_weights/siam_quality_anat/
anatomy.json — see the SIAMModel field docstrings)."""

import jax
import jax.numpy as jnp
import numpy as np

from mptpu.models.siam import SIAMModel, _mel_basis, make_iterative_fn


def tiny(**kw):
    return SIAMModel(
        n_samples=2**12, context_dim=16, in_channels=257,
        hidden_channels=32, n_events=3, transform_window_size=512,
        transform_step_size=256, fft_resonance=True, **kw,
    )


def _run(model, seed=0):
    key = jax.random.PRNGKey(seed)
    audio = jax.random.normal(key, (2, 1, model.n_samples)) * 0.1
    params = model.init(key, audio, key)
    fn = make_iterative_fn(model)
    channels, vecs, schedules, residual = jax.jit(fn)(params, audio, key)
    return params, channels, vecs, schedules


def test_spectral_skip_forward_finite_and_param_gated():
    base = tiny()
    skip = tiny(spectral_skip=True)
    p0, ch0, _, _ = _run(base)
    p1, ch1, _, _ = _run(skip)
    assert np.isfinite(np.asarray(ch1)).all()
    flat0 = jax.tree_util.tree_leaves(p0)
    flat1 = jax.tree_util.tree_leaves(p1)
    # the skip adds exactly one Dense (kernel+bias)
    assert len(flat1) == len(flat0) + 2


def test_spectral_filter_identity_at_init():
    """zeros kernel + softplus(bias)=1 must make the filter an exact
    identity: channels with the filter on equal channels with it off
    (same seed) to fft-roundtrip tolerance."""
    a = tiny(spectral_skip=True)
    b = tiny(spectral_skip=True, spectral_filter=True)
    pa, cha, _, _ = _run(a, seed=3)
    pb, chb, _, _ = _run(b, seed=3)
    # same seed => same init for shared params; filter params are extra
    na = np.asarray(cha)
    nb = np.asarray(chb)
    assert np.isfinite(nb).all()
    assert np.max(np.abs(na - nb)) < 1e-3 * max(np.max(np.abs(na)), 1e-9)


def test_spectral_filter_trains():
    """One gradient step through the filtered path stays finite and
    produces nonzero gradients on the filter gate."""
    m = tiny(spectral_skip=True, spectral_filter=True)
    key = jax.random.PRNGKey(1)
    audio = jax.random.normal(key, (1, 1, m.n_samples)) * 0.1
    params = m.init(key, audio, key)
    fn = make_iterative_fn(m)

    def loss(p):
        ch, _, _, _ = fn(p, audio, key)
        recon = jnp.sum(ch, axis=1, keepdims=True)
        return jnp.sum((recon - audio) ** 2)

    g = jax.grad(loss)(params)
    leaves, _ = jax.tree_util.tree_flatten_with_path(g)
    gate = [v for kp, v in leaves if "spec_filter_gate" in jax.tree_util.keystr(kp)]
    assert gate and all(np.isfinite(np.asarray(x)).all() for x in gate)
    assert any(float(jnp.sum(jnp.abs(x))) > 0 for x in gate)


def test_mel_basis_partition():
    M = np.asarray(_mel_basis(257, 32))
    assert M.shape == (32, 257)
    assert (M >= 0).all()
    # every row normalized (or empty)
    sums = M.sum(axis=1)
    assert np.all((np.abs(sums - 1.0) < 1e-4) | (sums == 0))


def test_spec_feat_wire_roundtrip():
    """generate(spec=...) must equal generate(spec_feat=precomputed):
    the wire can carry the 64-band feature instead of the residual."""
    m = tiny(spectral_skip=True, spectral_filter=True)
    key = jax.random.PRNGKey(5)
    audio = jax.random.normal(key, (2, 1, m.n_samples)) * 0.1
    params = m.init(key, audio, key)
    fn = make_iterative_fn(m)
    out = jax.jit(lambda p, a, k: fn(p, a, k, return_feats=True))(
        params, audio, key
    )
    channels, vecs, schedules, residual, feats = out
    assert feats.shape == (2, m.n_events, 64)
    # re-render event 0 open-loop from the wire tuple
    ch_wire = m.apply(
        params, vecs[:, :1], schedules[:, :1], jax.random.fold_in(key, 0),
        spec_feat=feats[:, 0], method=SIAMModel.generate,
    )
    # and from the full residual spec (the encode-side path)
    spec = m.transform(audio)
    ch_spec = m.apply(
        params, vecs[:, :1], schedules[:, :1], jax.random.fold_in(key, 0),
        spec, method=SIAMModel.generate,
    )
    assert np.allclose(np.asarray(ch_wire), np.asarray(ch_spec), atol=1e-5)

"""mptpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for sparse,
interpretable audio codecs.

Brand-new design with the capability surface of the
JohnVinyard/matching-pursuit research stack (see SURVEY.md for the
component inventory and reference file:line citations):

- ``mptpu.ops``        L0 spectral kernel layer (fft convolve/shift, stft,
                       band decompose/recompose, overlap-add, upsampling,
                       norms, pdfs, straight-through estimators)
- ``mptpu.sparse``     greedy matching pursuit + dictionary learning
                       (lax.scan engines), top-k sparsify family,
                       multiband dictionary learning
- ``mptpu.losses``     iterative (per-event energy removal) loss,
                       multiband spectrogram losses, correlation/noise
                       losses, GAN + serial losses
- ``mptpu.perceptual`` gammatone / AIM / PIF auditory front-ends
- ``mptpu.gen``        event-generator zoo (splatting, resonance,
                       state-space, conv-impulse) + schedulers + reverb
- ``mptpu.nn``         functional NN building blocks (anticausal stacks,
                       linear stacks, mixers, unets, positional encodings)
- ``mptpu.models``     flagship assemblies (SIAM iterative decomposition,
                       splat overfit, playable SSM, MP trainer)
- ``mptpu.data``       audio datastore + iterators (numpy WAV IO, no
                       external audio deps)
- ``mptpu.train``      optimizers, experiment runners, overfit harness,
                       checkpointing
- ``mptpu.parallel``   device-mesh / sharding utilities: data-parallel
                       training and dictionary-sharded matching pursuit
- ``mptpu.obs``        observability: KV collections, live dashboard,
                       static article export (conjure-equivalent)

Everything on the compute path is pure-functional JAX, batched first,
jit-compiled, with ``lax.scan`` for greedy/sequential structure and
``jax.custom_vjp`` for straight-through gradients.
"""

__version__ = "0.1.0"

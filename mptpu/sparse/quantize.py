"""Selection-type dispatch + item lookup (reference
``modules/quantize.py:13-39``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.ste import sparse_softmax, hard_softmax


def hard_choice(
    selections: jax.Array,
    selection_type: str = "sparse_softmax",
    key: jax.Array | None = None,
) -> jax.Array:
    if selection_type == "sparse_softmax":
        return sparse_softmax(selections, normalize=True, axis=-1)
    if selection_type == "identity":
        return selections
    if selection_type == "gumbel_softmax":
        if key is None:
            raise ValueError("gumbel_softmax selection requires a PRNG key")
        return hard_softmax(key, selections, axis=-1, tau=0.1)
    if selection_type == "softmax":
        return jax.nn.softmax(selections, axis=-1)
    if selection_type == "relu":
        if RELU_SELECTION_LEAK:
            # opt-in training aid (see set_selection_leak): relu-selected
            # mixtures go *exactly* silent when every logit is negative,
            # killing all gradients — the overfit-training death mode of
            # the reference's decoder stack; a small leak keeps them alive
            sel = jax.nn.leaky_relu(selections, RELU_SELECTION_LEAK)
        else:
            sel = jax.nn.relu(selections)
        if RELU_SELECTION_FLOOR:
            # opt-in training aid (see set_selection_floor): the leak
            # alone fixes the BACKWARD pass but the forward render is
            # still exactly zero when all logits are negative, so a dead
            # event leaves the greedy residual unchanged and every later
            # encode step re-picks the same frame with the same latent —
            # the r3 overfit4 run converged to 3/32 alive events this
            # way. A small additive floor (the envelope-selection
            # analogue of the event-switch ``attn_floor``) keeps every
            # event audible so the greedy loop differentiates and real
            # loss gradients (not just the leak) reach dead events.
            sel = sel + RELU_SELECTION_FLOOR
        return sel
    raise ValueError(f"{selection_type} is an unknown selection type")


# Trace-time knobs for the 'relu' selection type. 0.0 (default) is exact
# reference parity. Trainers may set small values (e.g. 0.01) BEFORE
# building/jitting the model; jitted programs capture the values at trace
# time.
RELU_SELECTION_LEAK: float = 0.0
RELU_SELECTION_FLOOR: float = 0.0


def set_selection_leak(leak: float) -> None:
    """Set the leaky-relu slope used by 'relu' selections (0 = parity)."""
    global RELU_SELECTION_LEAK
    RELU_SELECTION_LEAK = float(leak)


def set_selection_floor(floor: float) -> None:
    """Set the additive floor on 'relu' selection weights (0 = parity)."""
    global RELU_SELECTION_FLOOR
    RELU_SELECTION_FLOOR = float(floor)


def select_items(
    selections: jax.Array,
    items: jax.Array,
    selection_type: str = "sparse_softmax",
    key: jax.Array | None = None,
) -> jax.Array:
    """``hard_choice(selections) @ items``."""
    sel = hard_choice(selections, selection_type, key=key)
    return sel @ items


class QuantizedResonanceMixture:
    """Latent -> quantized code (sparse softmax) -> relu mixture over a
    saw/square/tri/sine wavetable (reference ``modules/quantize.py:42-80``,
    flax-free: weights are explicit params created by ``init``)."""

    def __init__(
        self,
        n_resonances: int,
        quantize_dim: int,
        n_samples: int,
        samplerate: int,
    ):
        from ..gen.transfer import make_waves
        from ..utils.music import musical_scale_hz

        self.n_resonances = n_resonances
        self.quantize_dim = quantize_dim
        self.n_samples = n_samples
        f0s = musical_scale_hz(
            start_midi=21, stop_midi=106, n_steps=n_resonances // 4
        )
        self.waves = make_waves(n_samples, f0s.tolist(), samplerate).reshape(
            1, n_resonances, n_samples
        )

    def init(self, key):
        import jax.numpy as jnp

        k1, k2 = jax.random.split(key)
        lim1 = 1.0 / jnp.sqrt(self.n_resonances)
        lim2 = 1.0 / jnp.sqrt(self.quantize_dim)
        return {
            "to_quantized": jax.random.uniform(
                k1, (self.n_resonances, self.quantize_dim),
                minval=-lim1, maxval=lim1,
            ),
            "to_choice": jax.random.uniform(
                k2, (self.quantize_dim, self.n_resonances),
                minval=-lim2, maxval=lim2,
            ),
        }

    def __call__(self, params, x, return_code: bool = False):
        import jax.numpy as jnp

        q = x @ params["to_quantized"]
        quantized = sparse_softmax(q, normalize=True, axis=-1)
        choice = jax.nn.relu(quantized @ params["to_choice"])
        resonances = choice @ self.waves
        if return_code:
            return quantized, resonances
        return resonances

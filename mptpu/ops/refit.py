"""Joint least-squares amplitude re-projection — the orthogonal-MP
amplitude fix-up, shared by the SIAM codec (event channels) and the
sparse MP engines (atom instances).

Greedy matching pursuit fixes each selection's amplitude against a
*stale* residual (reference ``modules/matchingpursuit.py:269-328``
re-projects atoms one at a time inside dictionary learning); solving the
tiny ``E x E`` normal equations once per segment makes the amplitudes
jointly optimal and can only lower waveform error: the current
amplitudes are in the feasible set. One ``(E, N) @ (N, E)`` matmul
(MXU-friendly) plus an ``E x E`` solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def refit_gains(
    target: jax.Array,
    channels: jax.Array,
    ridge: float = 1e-3,
    span: int | None = None,
) -> jax.Array:
    """Solve ``min_g || target - sum_i g_i * channels[:, i] ||^2``.

    Args:
      target: ``(batch, 1, n_samples)`` original signal.
      channels: ``(batch, n_events, n_samples)`` per-event signals.
      ridge: Tikhonov weight, scaled by the mean channel energy so it is
        amplitude-invariant; keeps dead (all-zero) channels at gain ~0
        and the solve well-conditioned under autodiff.
      span: optionally restrict the fit to the first ``span`` samples.

    Returns:
      ``(batch, n_events)`` gains; ``einsum('be,ben->bn', gains,
      channels)`` is the refit reconstruction.
    """
    tgt = target[:, 0, :span] if span is not None else target[:, 0]
    ch = channels[..., :span] if span is not None else channels
    gram = jnp.einsum("ben,bfn->bef", ch, ch)
    rhs = jnp.einsum("ben,bn->be", ch, tgt)
    n_events = channels.shape[1]
    # scale-invariant ridge: mean diagonal energy (plus an absolute
    # epsilon so an all-silent decode still yields a finite solve)
    lam = ridge * (
        jnp.trace(gram, axis1=-2, axis2=-1)[:, None, None] / n_events + 1e-12
    )
    gains = jnp.linalg.solve(
        gram + lam * jnp.eye(n_events, dtype=gram.dtype)[None], rhs[..., None]
    )[..., 0]
    return gains

"""Deterministic storm-injection tests for mptpu.train.guard.StormGuard
(VERDICT r4 item 7: the rollback-storm guards were previously validated
only by full-config chip runs; this replays the committed storm
signatures synthetically).

Scenario sources:
- sw5 storm (trained_weights/siam_overfit_full_sw5/storm.log): the
  full-config iter-~153 cliff — escalating spike train at cadence ~3
  (gnorm 7e5 -> 1.3e8 -> 6.5e11), snapshot refreshed mid-spike.
- r3c: a single finite spike self-heals; rolling back on it killed a
  healthy run.
- medium2: 12 rollbacks accumulated over 3.3k HEALTHY steps aborted a
  non-diverging run (the starvation mode; ADVICE r4 low finding).
"""

import math

from mptpu.train.guard import StormGuard


GRAD_CLIP = 1e3
CATASTROPHE = 1e5


def mk_guard(**kw):
    g = StormGuard(grad_clip=GRAD_CLIP, loss_catastrophe=CATASTROPHE, **kw)
    g.set_initial("state0", 0)
    return g


def warm(g, n=20, start=1, gnorm=5.0):
    """Feed n clean steps so the spike detector's history is armed."""
    it = start
    for _ in range(n):
        assert g.classify(it, 100.0, gnorm, True) == StormGuard.CLEAN
        it += 1
    return it


def test_single_spike_tolerated():
    g = mk_guard()
    warm(g, 20)
    # 20x median AND 10x clip, finite loss: tolerated (r3c self-heal)
    assert g.classify(21, 100.0, 2e4, True) == StormGuard.SPIKE
    # healthy afterwards
    assert g.classify(22, 100.0, 5.0, True) == StormGuard.CLEAN
    assert g.total_rollbacks == 0


def test_escalating_train_is_bad():
    """The sw5 cadence: spikes every ~3 checks with clean steps between
    — the SECOND spike within the near window must classify BAD."""
    g = mk_guard()
    warm(g, 20)
    assert g.classify(150, 100.0, 7e5, True) == StormGuard.SPIKE
    assert g.classify(151, 100.0, 5.0, True) == StormGuard.CLEAN
    assert g.classify(152, 100.0, 5.0, True) == StormGuard.CLEAN
    assert g.classify(153, 100.0, 1.3e8, True) == StormGuard.BAD
    assert g.last_escalation_iter == 153


def test_nonfinite_and_catastrophe_are_bad():
    g = mk_guard()
    warm(g, 20)
    assert g.classify(21, math.inf, 5.0, True) == StormGuard.BAD
    g2 = mk_guard()
    warm(g2, 20)
    assert g2.classify(21, CATASTROPHE * 2, 5.0, True) == StormGuard.BAD
    g3 = mk_guard()
    warm(g3, 20)
    assert g3.classify(21, 100.0, 5.0, False) == StormGuard.BAD


def test_snapshot_defers_during_spikes_and_rollback_lands_behind_cliff():
    """The sw5 failure mode, end to end: a boundary landing mid-spike
    must NOT become the rollback target; the rollback must restore the
    pre-cliff state."""
    g = mk_guard()
    it = warm(g, 30)
    # boundary at iter 50: quiet -> candidate captured
    ev = g.healthy_boundary(50, "state50")
    assert not ev.endswith("+deferred")
    # window 50..100 clean -> promotion at the next boundary
    for i in range(51, 100):
        g.classify(i, 100.0, 5.0, True)
    ev = g.healthy_boundary(100, "state100")
    assert ev.startswith("promoted")
    assert g.good == ("state50", 50)
    # the iter-100 boundary also captured a fresh candidate; a clean
    # window 100..148 promotes it at the 150 boundary (it predates the
    # cliff by 48 steps — safe)
    # cliff at ~148: spike right before the 150 boundary
    g.classify(148, 100.0, 7e5, True)
    ev = g.healthy_boundary(150, "state150_mid_spike")
    # candidate capture deferred: state150 is too close to the spike —
    # the mid-spike boundary state can never become the target
    assert ev.endswith("+deferred")
    # escalation at 153 -> BAD -> rollback target is the pre-cliff
    # state100, NOT the mid-spike boundary state
    assert g.classify(153, 100.0, 6.5e11, True) == StormGuard.BAD
    assert g.rollback_target() == ("state100", 100)
    aborted = g.note_rollback()
    assert not aborted
    # the deferred/stale candidate must be gone after rollback
    assert g.snap_candidate is None


def test_promotion_survives_isolated_singles():
    """ADVICE r4 starvation: benign single spikes more often than once
    per boundary window must not starve promotion forever."""
    g = mk_guard()
    warm(g, 30)
    g.healthy_boundary(50, "state50")
    # one isolated spike inside the window
    g.classify(70, 100.0, 2e4, True)
    for i in range(71, 100):
        g.classify(i, 100.0, 5.0, True)
    ev = g.healthy_boundary(100, "state100")
    assert ev.startswith("promoted")
    assert g.good == ("state50", 50)


def test_escalation_in_window_blocks_promotion():
    g = mk_guard()
    warm(g, 30)
    g.healthy_boundary(50, "state50")
    # escalating pair inside the window (tolerated->BAD); pretend the
    # trainer chose to continue (no rollback call) — promotion must
    # still be blocked
    g.classify(70, 100.0, 2e4, True)
    assert g.classify(72, 100.0, 8e4, True) == StormGuard.BAD
    for i in range(73, 100):
        g.classify(i, 100.0, 5.0, True)
    ev = g.healthy_boundary(100, "state100")
    assert ev.startswith("discarded")
    assert g.good == ("state0", 0)


def test_abort_counter_resets_on_promotion_and_progress():
    """medium2: 12 rollbacks over thousands of healthy steps must not
    abort. Consecutive failures from ONE state still must."""
    g = mk_guard()
    warm(g, 30)
    for k in range(11):
        assert not g.note_rollback()
    # healthy boundary with net progress past the target resets it
    g.healthy_boundary(500, "s500")
    assert g.rollbacks == 0
    # promotion also resets
    for k in range(11):
        assert not g.note_rollback()
    g.healthy_boundary(550, "s550")
    for i in range(551, 600):
        g.classify(i, 100.0, 5.0, True)
    ev = g.healthy_boundary(600, "s600")
    assert ev.startswith("promoted")
    assert g.rollbacks == 0
    # but 12 consecutive failures from one state abort
    g2 = mk_guard()
    aborted = False
    for k in range(12):
        aborted = g2.note_rollback()
    assert aborted


def test_run_resumes_and_passes_injection_point():
    """Full loop simulation: injected escalating cliff at iter 153,
    rollback to the hindsight target, then a clean re-approach passes
    the injection point and promotion resumes."""
    g = mk_guard()

    def spike_at(i, cliff_active):
        if cliff_active and i in (150, 153, 156):
            return {150: 7e5, 153: 1.3e8, 156: 6.5e11}[i]
        return 5.0

    state = lambda i: f"s{i}"
    cliff_active = True
    i = 1
    rollback_iters = []
    restored_to = None
    warm(g, 20)
    i = 21
    while i < 400:
        v = g.classify(i, 100.0, spike_at(i, cliff_active), True)
        if v == StormGuard.BAD:
            restored_to = g.rollback_target()
            assert not g.note_rollback()
            rollback_iters.append(i)
            # lr halved by the trainer -> the cliff does not re-fire
            cliff_active = False
            i = restored_to[1] + 1
            continue
        if i % 50 == 0:
            g.healthy_boundary(i, state(i))
        i += 1
    assert rollback_iters == [153]
    assert restored_to[1] == 100  # hindsight target behind the cliff
    # run passed the injection point and kept promoting
    assert g.good[1] >= 300
    assert g.total_rollbacks == 1


def test_catastrophic_restore_clears_candidate():
    """ADVICE r4 medium: a candidate captured on the collapsing
    trajectory must not be promotable after the eval-catastrophe
    restore."""
    g = mk_guard()
    warm(g, 30)
    g.healthy_boundary(50, "poisoned_candidate")
    g.catastrophic_restore("best_eval_state", 25)
    assert g.snap_candidate is None
    assert g.good == ("best_eval_state", 25)
    # the next boundary must not resurrect the old candidate
    for i in range(31, 100):
        g.classify(i, 100.0, 5.0, True)
    ev = g.healthy_boundary(100, "fresh")
    assert not ev.startswith("promoted")
    assert g.good == ("best_eval_state", 25)


def test_clustered_nongrowing_spikes_tolerated():
    """sw6 regression: benign spikes clustering within the near window
    but NOT growing (the escalation signature grows >=3x, sw5 grew
    186x) must stay tolerated — rolling back on them starved a healthy
    full-config run to lr_mult 1e-4."""
    g = mk_guard()
    warm(g, 20)
    assert g.classify(100, 100.0, 1.7e5, True) == StormGuard.SPIKE
    # second spike 6 steps later, SMALLER than the first: tolerated
    assert g.classify(106, 100.0, 1.4e5, True) == StormGuard.SPIKE
    # third, similar magnitude: still tolerated
    assert g.classify(112, 100.0, 1.5e5, True) == StormGuard.SPIKE
    assert g.total_rollbacks == 0
    # but a genuinely growing pair still escalates
    assert g.classify(118, 100.0, 6e5, True) == StormGuard.BAD

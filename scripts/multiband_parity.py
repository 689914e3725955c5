"""Multiband dictionary-learning TRAJECTORY parity vs the torch reference
(VERDICT r2 item 3 / BASELINE config #2's <=0.1 dB budget is about the
LEARNED result, not just one step).

Runs N dictionary-learning iterations side by side at the
``e_2024_4_24`` configuration (7 octave bands 512..32768, 512 atoms x
128 taps per band, 64 sparse-coding steps per band, 2^15-sample
segments — ``/root/reference/experiments/e_2024_4_24/experiment.py:20-42``)
starting from IDENTICAL initial dictionaries, and reports per-iteration
reconstruction SNR for both frameworks
(``/root/reference/modules/multibanddict.py:394-473``).

CPU-only (torch is CPU-only in this image; our engine is forced onto the
CPU backend so both sides run the same arithmetic class).
"""

from __future__ import annotations

import json
import os
import sys
import time
import types
import importlib.util

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference"


def load_reference():
    import torch

    # stub the non-leaf imports multibanddict pulls in
    zounds = types.ModuleType("zounds")

    class SR22050:
        pass

    zounds.SR22050 = SR22050
    zounds.SampleRate = SR22050
    sys.modules.setdefault("zounds", zounds)
    util = types.ModuleType("util")
    util.device = torch.device("cpu")
    sys.modules.setdefault("util", util)

    pkg = types.ModuleType("modules")
    pkg.__path__ = [os.path.join(REF, "modules")]
    sys.modules.setdefault("modules", pkg)

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    for leaf in ("normalization", "fft", "conv", "softmax", "pos_encode",
                 "sparse", "decompose", "stft"):
        _load(f"modules.{leaf}", f"{REF}/modules/{leaf}.py")
    _load("modules.matchingpursuit", f"{REF}/modules/matchingpursuit.py")
    return _load("modules.multibanddict", f"{REF}/modules/multibanddict.py")


def main(iterations: int = 10, steps: int = 64, batch_size: int = 2):
    import torch

    torch.set_num_threads(1)
    mbd = load_reference()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mptpu.sparse import BandSpec, MultibandDictionaryLearning
    from mptpu.ops.norms import unit_norm
    from mptpu.data.synthetic import synthetic_audio

    n_samples = 2**15
    n_atoms, atom_size = 512, 128
    sizes = [512, 1024, 2048, 4096, 8192, 16384, 32768]

    rng = np.random.default_rng(99)
    init_dicts = {
        s: rng.uniform(-1, 1, (n_atoms, atom_size)).astype(np.float32)
        for s in sizes
    }

    batch = np.stack(
        [synthetic_audio(n_samples, seed=100 + i) for i in range(batch_size)]
    ).reshape(batch_size, 1, n_samples)

    # ---- reference model
    ref_model = mbd.MultibandDictionaryLearning(
        [
            mbd.BandSpec(
                s, n_atoms, atom_size, device=torch.device("cpu"),
                signal_samples=n_samples, is_lowest_band=(s == sizes[0]),
            )
            for s in sizes
        ],
        n_samples=n_samples,
    )
    for s in sizes:
        ref_model.bands[s].d = mbd.unit_norm(torch.from_numpy(init_dicts[s]))
    t_batch = torch.from_numpy(batch.astype(np.float32))

    # ---- ours
    our_model = MultibandDictionaryLearning(
        [
            BandSpec(
                s, n_atoms, atom_size, signal_samples=n_samples,
                is_lowest_band=(s == sizes[0]),
                d=unit_norm(jnp.asarray(init_dicts[s])),
            )
            for s in sizes
        ],
        n_samples=n_samples,
    )
    j_batch = jnp.asarray(batch)

    def ref_snr():
        with torch.no_grad():
            recon, _ = ref_model.recon(t_batch, steps)
        num = float((t_batch**2).sum())
        den = float(((t_batch - recon) ** 2).sum())
        return 10.0 * np.log10(num / max(den, 1e-12))

    def our_snr():
        recon, _ = our_model.recon(j_batch, steps)
        num = float(jnp.sum(j_batch**2))
        den = float(jnp.sum((j_batch - recon) ** 2))
        return 10.0 * np.log10(num / max(den, 1e-12))

    rows = []
    t0 = time.perf_counter()
    for it in range(iterations + 1):
        if it > 0:
            ts = time.perf_counter()
            with torch.no_grad():
                ref_model.learn(t_batch, steps)
            t_ref = time.perf_counter() - ts
            ts = time.perf_counter()
            our_model.learn(j_batch, steps)
            t_ours = time.perf_counter() - ts
        else:
            t_ref = t_ours = 0.0
        r, o = ref_snr(), our_snr()
        rows.append({
            "iteration": it,
            "ref_snr_db": round(r, 3),
            "ours_snr_db": round(o, 3),
            "delta_db": round(o - r, 3),
            "ref_learn_s": round(t_ref, 1),
            "ours_learn_s": round(t_ours, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    out = {
        "config": (
            f"7 bands 512..32768, {n_atoms} atoms x {atom_size}, "
            f"{steps} steps/band, batch {batch_size}, 2^15 samples, "
            "identical init dicts, CPU both sides"
        ),
        "rows": rows,
        "max_abs_delta_db": max(abs(r["delta_db"]) for r in rows),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    os.makedirs("trained_weights", exist_ok=True)
    with open("trained_weights/multiband_parity.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"max |delta| {out['max_abs_delta_db']} dB "
          f"({out['wall_s']}s)", flush=True)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=2)
    a = p.parse_args()
    main(a.iterations, a.steps, a.batch_size)

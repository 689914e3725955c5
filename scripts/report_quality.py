"""Regenerate report_quality.html FROM COMMITTED ARTIFACTS ONLY
(VERDICT r4 item 9: put the perceptual numbers — PIF distance and LSD —
beside the SNR table for the best available synthetic-holdout regime,
the closest analog this environment has to the reference's published
demo material, ``/root/reference/v3blogpost.py:59-93``).

Reads only metrics.json / anatomy.json files that are checked into the
repo, so the page can always be rebuilt from history.

Usage: python scripts/report_quality.py [--out report_quality.html]
"""

from __future__ import annotations

import argparse
import html
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = [
    ("siam_quality_medium", "fixed 144 s corpus, 30k steps (r4)"),
    ("siam_quality_anat", "fresh infinite corpus, 5k steps (r5 control)"),
    ("siam_quality_anatB", "fresh + spectral_skip (r5 arm B)"),
    ("siam_quality_anatC", "fresh + spectral_skip + spectral_filter (r5 arm C)"),
]


def load(run):
    path = os.path.join("trained_weights", run, "metrics.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def fmt(x, nd=2):
    return "—" if x is None else f"{x:.{nd}f}"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="report_quality.html")
    args = p.parse_args()

    rows = []
    for run, label in RUNS:
        m = load(run)
        if not m:
            continue
        evals = [e for e in m.get("eval", []) if "first_half_lsd_db" in e]
        if not evals:
            continue
        warm = [e for e in evals if e["step"] >= 750] or evals
        lsd = [e["first_half_lsd_db"] for e in warm]
        snr = [e.get("holdout_snr_db") for e in warm if e.get("holdout_snr_db") is not None]
        pif = [e.get("first_half_pif_dist") for e in warm if e.get("first_half_pif_dist") is not None]
        rows.append({
            "run": run, "label": label,
            "n_evals": len(warm),
            "lsd_best": min(lsd),
            "lsd_mean": float(np.mean(lsd)),
            "lsd_below_plateau": sum(1 for v in lsd if v < 24.81),
            "snr_mean": float(np.mean(snr)) if snr else None,
            "pif_mean": float(np.mean(pif)) if pif else None,
        })

    tr = ""
    for r in rows:
        tr += (
            f"<tr><td>{html.escape(r['label'])}<br><code>{r['run']}</code></td>"
            f"<td>{fmt(r['snr_mean'], 3)}</td>"
            f"<td><b>{fmt(r['lsd_best'])}</b></td>"
            f"<td>{fmt(r['lsd_mean'])}</td>"
            f"<td>{r['lsd_below_plateau']}/{r['n_evals']}</td>"
            f"<td>{fmt(r['pif_mean'], 3)}</td></tr>"
        )

    anat_rows = ""
    for run, label in (("siam_quality_anat", "control"),
                       ("siam_quality_anatB", "spectral_skip"),
                       ("siam_quality_anatC", "skip + filter")):
        path = os.path.join("trained_weights", run, "anatomy.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            a = json.load(f)
        anat_rows += (
            f"<tr><td>{label} (step {a['checkpoint_step']})</td>"
            f"<td>{a['rho_max_mean']}</td><td>{a['rho_chance_mean']}</td>"
            f"<td>{a['as_placed_snr_db']}</td><td>{a['oracle_gain_snr_db']}</td>"
            f"<td>{a['oracle_align_snr_db']}</td><td>{a['oracle_place_snr_db']}</td></tr>"
        )

    # full-config flagship holdout trajectory, if present (sw6)
    sw6 = load("siam_overfit_full_sw6")
    sw6_html = ""
    if sw6:
        evs = [e for e in sw6.get("eval", []) if "holdout_first_half_lsd_db" in e]
        if evs:
            last = evs[-1]
            best_lsd = min(e["holdout_first_half_lsd_db"] for e in evs)
            sw6_html = (
                "<h2>Full-config flagship (sw6): holdout trajectory rides along</h2>"
                f"<p>{len(evs)} evals; latest step {last['step']}: train first-half SNR "
                f"{last['first_half_snr_db']} dB; holdout first-half SNR "
                f"{last['holdout_first_half_snr_db']} dB, LSD "
                f"{last['holdout_first_half_lsd_db']} dB (best {best_lsd:.2f}), PIF "
                f"{last['holdout_first_half_pif_dist']}. Full series in "
                "<code>trained_weights/siam_overfit_full_sw6/metrics.json</code>.</p>"
            )

    page = f"""<!doctype html><html><head><meta charset='utf-8'>
<title>SIAM quality — perceptual scoreboard</title>
<style>body{{max-width:900px;margin:2em auto;font-family:Georgia,serif;line-height:1.55;color:#0b0b0b;padding:0 1em}}
h1,h2{{font-family:Helvetica,sans-serif}}
table{{border-collapse:collapse;width:100%;font-size:0.92em}}
td,th{{border:1px solid #e4e3df;padding:6px 8px;text-align:right}}
td:first-child,th:first-child{{text-align:left}}
code{{font-size:0.85em;color:#52514e}}</style></head><body>
<h1>Unseen-audio reconstruction: perceptual scoreboard</h1>
<p>The reference's published capability is perceptually convincing
reconstruction of held-out MusicNet after ~126k steps
(<code>/root/reference/v3blogpost.py:59-93</code>). This environment has no
real-music corpus, so the closest measurable regime is the dense synthetic
holdout (content-disjoint seeds). Waveform SNR alone under-reports a
magnitude-trained codec, so the perceptual pair rides beside it:
<b>LSD</b> (log-spectral distance, dB, lower better) and <b>PIF</b>
(phase-invariant feature distance, lower better). The long-standing
plateau floor across rounds 3–4 was first-half holdout LSD
<b>24.81 dB</b> — no run ever scored below it before round 5.</p>
<table>
<tr><th>run</th><th>holdout SNR (dB, mean)</th><th>holdout first-half LSD best</th>
<th>LSD mean</th><th>evals &lt; 24.81</th><th>PIF mean</th></tr>
{tr}
</table>
<h2>Event anatomy on the holdout (oracle ladder)</h2>
<p>Per-event forensics (<code>scripts/holdout_anatomy.py</code>): best
normalized cross-correlation of each rendered event against the holdout
residual over all lags (rho_max) vs the same event against unrelated
audio (rho_chance), and the first-half SNR these exact waveforms could
deliver under increasingly generous oracles.</p>
<table>
<tr><th>arm</th><th>rho_max</th><th>rho_chance</th><th>as placed (dB)</th>
<th>oracle gain</th><th>oracle ±256</th><th>oracle any-lag</th></tr>
{anat_rows}
</table>
<p>Reading: waveform correlation sits at chance in every arm and the
any-placement oracle is ≤0.1 dB — time-domain SNR on unseen audio is
bounded by the event waveforms themselves, which is why the round-5
levers (spectral_skip / spectral_filter) target the rendered
<i>spectrum</i> and are scored by LSD/PIF above.</p>
{sw6_html}
<p>Trajectory charts: <a href="report_generalization.html">report_generalization.html</a>.
All numbers regenerate from committed metrics via
<code>python scripts/report_quality.py</code>.</p>
</body></html>"""
    with open(args.out, "w") as f:
        f.write(page)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

"""Assemble the round-5 RESULTS.md tables from the campaign artifacts.

Reads (each optional — sections are skipped until their stage lands):
  artifacts/corpus_run_v2/results.json        round-4 archived flagship
  artifacts/corpus_run_v2_repro/results.json  stage R (round-5 flagship)
  artifacts/corpus_run_v2_repro/train_metrics.jsonl
  artifacts/corpus_run_lofo/results.json      stage F (trained w/o dance)
  artifacts/corpus_run_v3/results.json        stage H (freeform2 boost)

Pure-json aggregation — safe to run beside a TPU job via `python -S`
(skips the axon sitecustomize; no jax import anywhere).
"""

import json
import os

A = "/root/repo/artifacts"

METRICS = [("angle_deg", "joint angle err (deg)"),
           ("sip_deg", "SIP err (deg)"),
           ("j_pos_cm", "joint pos err (cm)"),
           ("root_drift_2s", "root drift @2 s (m)"),
           ("root_drift_5s", "root drift @5 s (m)"),
           ("root_drift_10s", "root drift @10 s (m)"),
           ("jerk", "jerk x100"),
           ("root_jerk", "root jerk x100")]
FAM_METRICS = ["angle_deg", "j_pos_cm", "root_drift_10s"]
MODES = ["recompute", "kv_cache", "kv_cache_rnn_carry",
         "recompute_full_terrain"]


def load(path):
    p = os.path.join(A, path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def milestones(run_dir, at=(1, 10, 50, 100, 200, 400, 800, 1100)):
    p = os.path.join(A, run_dir, "train_metrics.jsonl")
    if not os.path.exists(p):
        return
    rows, best = {}, (1e9, -1)
    with open(p) as f:
        for line in f:
            r = json.loads(line)
            rows[r["epoch"]] = r["mean_loss"]
            best = min(best, (r["mean_loss"], r["epoch"]))
    print(f"### Convergence ({run_dir})\n")
    print("| epoch | mean loss |")
    print("|---|---|")
    for e in at:
        if e in rows:
            print(f"| {e} | {rows[e]:.4g} |")
    print(f"\nbest epoch {best[1]}: {best[0]:.4g}; "
          f"epochs logged: {len(rows)}\n")


def mode_table(results, title, modes=MODES):
    have = [m for m in modes if m in results["modes"]]
    print(f"### {title} (step {results['step']}, "
          f"n={results['n_test']})\n")
    print("| metric | " + " | ".join(have) + " |")
    print("|---" * (len(have) + 1) + "|")
    for k, label in METRICS:
        cells = [f"{results['modes'][m]['means'][k]:.3f}" for m in have]
        print(f"| {label} | " + " | ".join(cells) + " |")
    print()


def family_table(results, mode, title, other=None, other_name=""):
    fams = results["modes"][mode]["by_family"]
    order = sorted(fams, key=lambda f: fams[f]["angle_deg"])
    cols = "| family | n | angle (deg) | j pos (cm) | drift @10 s (m) |"
    if other is not None:
        cols += f" angle {other_name} | drift@10s {other_name} |"
    print(f"### {title} ({mode})\n")
    print(cols)
    print("|---" * (cols.count("|") - 1) + "|")
    for f in order:
        r = fams[f]
        row = (f"| {f} | {r['n']} | {r['angle_deg']:.2f} | "
               f"{r['j_pos_cm']:.2f} | {r['root_drift_10s']:.2f} |")
        if other is not None:
            o = other["modes"][mode]["by_family"].get(f)
            row += (f" {o['angle_deg']:.2f} | {o['root_drift_10s']:.2f} |"
                    if o else " — | — |")
        print(row)
    print()


def delta_table(a, b, name_a, name_b, mode, title, fam=None):
    ra = a["modes"][mode]["by_family"][fam] if fam \
        else a["modes"][mode]["means"]
    rb = b["modes"][mode]["by_family"][fam] if fam \
        else b["modes"][mode]["means"]
    print(f"### {title}\n")
    print(f"| metric | {name_a} | {name_b} | ratio |")
    print("|---|---|---|---|")
    for k, label in METRICS:
        va, vb = ra[k], rb[k]
        ratio = f"{vb / va:.2f}x" if va > 1e-9 else "—"
        print(f"| {label} | {va:.3f} | {vb:.3f} | {ratio} |")
    print()


def terrain_table(results, title):
    m = results["modes"].get("recompute_full_terrain", {})
    t = m.get("terrain")
    if not t:
        return
    print(f"### Terrain ({title})\n")
    for k in sorted(t):
        print(f"- {k}: {t[k]:.4g}" if isinstance(t[k], float)
              else f"- {k}: {t[k]}")
    tb = m.get("terrain_by_family")
    if tb:
        print("\n| family | " + " | ".join(sorted(next(iter(tb.values()))))
              + " |")
        ncol = len(next(iter(tb.values()))) + 1
        print("|---" * ncol + "|")
        for f in sorted(tb):
            cells = [f"{tb[f][k]:.3g}" for k in sorted(tb[f])]
            print(f"| {f} | " + " | ".join(cells) + " |")
    print()


def sbp_table(results, title):
    m = results["modes"].get("recompute_full_terrain", {})
    s = m.get("sbp")
    if not s:
        return
    print(f"### SBP channels ({title})\n")
    chans = s.get("channels", s)
    print("| channel | gt+ | precision | recall | F1 |")
    print("|---|---|---|---|---|")
    for name, r in (chans.items() if isinstance(chans, dict)
                    else enumerate(chans)):
        print(f"| {name} | {r.get('gt_rate', float('nan')):.3f} | "
              f"{r['precision']:.3f} | {r['recall']:.3f} | {r['f1']:.3f} |")
    print()


def main():
    r4 = load("corpus_run_v2/results.json")
    rR = load("corpus_run_v2_repro/results.json")
    rF = load("corpus_run_lofo/results.json")
    rH = load("corpus_run_v3/results.json")

    milestones("corpus_run_v2_repro")
    if rR:
        mode_table(rR, "Stage R flagship (round-5 repro, device sampler)")
        family_table(rR, "recompute", "Stage R per-family",
                     other=rR if "recompute_full_terrain" in rR["modes"]
                     else None, other_name="(terrain)")
        terrain_table(rR, "stage R")
        sbp_table(rR, "stage R")
    if rR and r4:
        delta_table(r4, rR, "round-4 archived", "round-5 stage R",
                    "recompute",
                    "Reproducibility: round-4 flagship vs stage R retrain "
                    "(same data/seeds; sampler host->device)")
    if rR and rF:
        delta_table(rR, rF, "trained WITH dance", "LOFO (without)",
                    "recompute", "Leave-one-family-out: dance family",
                    fam="dance")
        for k, lab in (("angle_deg", "angle"),):
            fams = rF["modes"]["recompute"]["by_family"]
            print("LOFO non-dance sanity (angle): " + ", ".join(
                f"{f}={fams[f]['angle_deg']:.2f}" for f in sorted(fams)))
        print()
    if rR and rH:
        delta_table(rR, rH, "v2 flagship", "v3 freeform-boost",
                    "recompute", "Corpus v3 A/B: freeform family",
                    fam="freeform")
        delta_table(rR, rH, "v2 flagship", "v3 freeform-boost",
                    "recompute", "Corpus v3 A/B: overall means")
    for missing, name in ((rR, "stage R"), (rF, "stage F"),
                          (rH, "stage H")):
        if missing is None:
            print(f"[{name} results not present yet]")


if __name__ == "__main__":
    main()

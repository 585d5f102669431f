"""Phase diagram for the headline hallucination claim (r4 VERDICT #4).

QUALITY.md's 2-corpus x 4-mode matrix ended in an honest tie at ONE point
of (phantom prevalence = 0.74, CE anchor w = 10): LRP-weighted SCST did
not separate from plain SCST.  The confound was named but not isolated —
at high prevalence the reward itself pushes phantomward (the phantom sits
in most reference captions), so the operating point may simply sit where
no inference-weighting mechanism can win.  This sweep maps the boundary:

    prevalence (--inject-p) x CE anchor (--scst-ce-weight)
        x {cider, lrp_cider}   (+ xe_cont control per prevalence)

on the annotation corpus (phantom words appear in captions but never in
pixels — the evidence-free regime the reference's weighting targets,
train.py:252-286), XE-control-normalized, fixed budget.  One warm XE model
is trained per prevalence and shared by every branch via --warm-params.

Runs tools/synthetic_hallucination.py in-process per cell; writes one
combined artifact (default output/hallucination_sweep.json) and a summary
table to stdout.  Designed to resume: completed cells found in the output
file are skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import synthetic_hallucination  # noqa: E402


def cell_key(p: float, w: float, mode: str) -> str:
    return f"p{p:g}_w{w:g}_{mode}"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/hallucination_sweep.json")
    ap.add_argument("--work", default="output/halluc_sweep_work")
    ap.add_argument("--prevalences", default="0.35,0.55,0.75")
    ap.add_argument("--anchors", default="3,10")
    ap.add_argument("--modes", default="cider,lrp_cider")
    ap.add_argument("--train-images", type=int, default=1500)
    ap.add_argument("--val-images", type=int, default=100)
    ap.add_argument("--warm-epochs", type=int, default=14)
    ap.add_argument("--tune-epochs", type=int, default=6)
    ap.add_argument("--num-phantoms", type=int, default=2)
    args = ap.parse_args(argv)

    prevalences = [float(x) for x in args.prevalences.split(",")]
    anchors = [float(x) for x in args.anchors.split(",")]
    modes = args.modes.split(",")

    results = {}
    if os.path.isfile(args.out):
        results = json.load(open(args.out))
        print(f"resuming: {len(results)} cells present", flush=True)

    def save():
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, default=float)

    def run_cell(tag, extra_argv, warm_dir, prevalence):
        out_json = os.path.join(args.work, f"{tag}.json")
        base = [
            "--bias-mode", "annotation",
            "--train-images", str(args.train_images),
            "--val-images", str(args.val_images),
            "--warm-epochs", str(args.warm_epochs),
            "--tune-epochs", str(args.tune_epochs),
            "--num-phantoms", str(args.num_phantoms),
            "--inject-p", str(prevalence),
            "--out", out_json,
        ]
        t0 = time.time()
        synthetic_hallucination.main(base + extra_argv)
        res = json.load(open(out_json))
        res["_seconds"] = time.time() - t0
        return res

    os.makedirs(args.work, exist_ok=True)
    for p in prevalences:
        warm_dir = os.path.join(args.work, f"warm_p{p:g}")
        warm_params = os.path.join(warm_dir, "warm_params")
        ctrl_key = cell_key(p, 0, "xe_cont")
        if ctrl_key not in results:
            # first cell per prevalence trains + saves the warm model and
            # runs the xe_cont control branch
            res = run_cell(f"p{p:g}_control",
                           ["--modes", "xe_cont",
                            "--save-params", warm_dir],
                           warm_dir, p)
            results[cell_key(p, 0, "xe_warm")] = {
                "stats": res["xe_warm"]["stats"],
                "mechanism": res["xe_warm"].get("mechanism"),
                "final_cider": res["xe_warm"]["final_cider"],
            }
            results[ctrl_key] = {
                "stats": res["xe_cont"]["stats"],
                "mechanism": res["xe_cont"].get("mechanism"),
                "final_cider": res["xe_cont"]["final_cider"],
                "seconds": res["_seconds"],
            }
            save()
            print(f"[sweep] {ctrl_key} done", flush=True)
        for w in anchors:
            for mode in modes:
                key = cell_key(p, w, mode)
                if key in results:
                    continue
                res = run_cell(f"p{p:g}_w{w:g}_{mode}",
                               ["--modes", mode,
                                "--warm-params", warm_params,
                                "--scst-ce-weight", str(w)],
                               warm_dir, p)
                results[key] = {
                    "stats": res[mode]["stats"],
                    "mechanism": res[mode].get("mechanism"),
                    "final_cider": res[mode]["final_cider"],
                    "seconds": res["_seconds"],
                }
                save()
                print(f"[sweep] {key} done: "
                      f"{json.dumps(results[key]['stats'])}", flush=True)

    # summary table: hallucination_rate (P(any phantom named)) per cell,
    # XE-control-normalized
    print("\n=== phase diagram: hallucination_rate "
          "(delta vs xe_cont control) ===")
    for p in prevalences:
        ctrl = results[cell_key(p, 0, "xe_cont")]["stats"]
        c0 = ctrl.get("hallucination_rate")
        print(f"prevalence {p:g}: control={c0:.3f} "
              f"cider={results[cell_key(p, 0, 'xe_cont')]['final_cider']:.3f}")
        for w in anchors:
            row = []
            for mode in modes:
                st = results[cell_key(p, w, mode)]
                r = st["stats"].get("hallucination_rate")
                row.append(f"{mode}={r:.3f} (d={r - c0:+.3f}, "
                           f"cider={st['final_cider']:.2f})")
            print(f"  w={w:g}: " + "  ".join(row))
    save()
    print("wrote", args.out)


if __name__ == "__main__":
    main()

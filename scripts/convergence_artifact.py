"""Production-CLI convergence artifact: train CLI -> orbax -> eval CLI -> mAP.

Drives the REAL production entry points end-to-end — ``python -m
hspose_tpu.engine.train`` (dataset walk, loader pool, augmentation, jitted
train step, orbax checkpoint) and ``python -m hspose_tpu.evaluation.evaluate``
(streamed detection crops, batched inference, full mAP grids) — on the
rendered synthetic NOCS tree (scripts/make_synth_nocs.py), and prints the
trained-checkpoint mAP table next to an init-weights table.  This is the
in-environment stand-in for the reference's demonstrated recipe
(/root/reference/engine/train.py:72-130 + evaluation/evaluate.py:79-140);
the REAL275 oracle itself needs the NOCS data + released weights, which do
not exist here.

Every training/eval claim elsewhere (train_sanity, parity studies) runs a
bespoke synthetic harness that bypasses the dataset/loader/checkpoint path —
this script is the one that proves the production loop itself converges.

Usage:
  python scripts/convergence_artifact.py [--tree DIR] [--steps N]
      [--sample-mode host|device] [--skip-train]   # reuse existing run dirs

Runtime: ~20 min/mode on one chip (host-bound on this 1-core rig; the train
step itself consumes ~470 samples/s).
"""

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HEADLINE = ["3D IoU at 25", "3D IoU at 50", "3D IoU at 75", "5 degree, 2cm",
            "5 degree, 5cm", "10 degree, 2cm", "10 degree, 5cm",
            "10 degree, 10cm", "5 degree", "10 degree", "2cm", "5cm", "10cm"]


def run(cmd, log):
    print(f"$ {' '.join(cmd)}  (log: {log})", flush=True)
    with open(log, "w") as f:
        p = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, cwd=ROOT)
    if p.returncode != 0:
        with open(log) as f:
            sys.stderr.write(f.read()[-4000:])
        raise SystemExit(f"command failed rc={p.returncode}: {' '.join(cmd)}")


def train_cli(tree, out_dir, steps, sample_mode, seed=7):
    cmd = [sys.executable, "-u", "-m", "hspose_tpu.engine.train",
           f"data.dataset_dir={tree}/NOCS",
           f"data.detection_dir={tree}/segmentation_results",
           f"data.sample_mode={sample_mode}",
           "train.batch_size=24", "model.compute_dtype=bfloat16",
           "optim.lr=4.5e-4", "optim.warmup_iters=100",
           "train.total_epoch=1", f"train.train_steps={steps}",
           "train.save_every=1", "train.log_every=100",
           f"train.seed={seed}", f"train.model_save={out_dir}"]
    run(cmd, os.path.join(out_dir, "train_cli.log"))


def eval_cli(tree, ckpt_dir, out_dir, steps, sample_mode):
    from hspose_tpu.engine.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(ckpt_dir)
    assert ckpt, f"no checkpoints under {ckpt_dir}"
    # eval runs the default f32-exact serving tier (the training/parity
    # default); the checkpoint's params are f32 regardless of the training
    # compute dtype
    cmd = [sys.executable, "-u", "-m", "hspose_tpu.evaluation.evaluate",
           f"data.dataset_dir={tree}/NOCS",
           f"data.detection_dir={tree}/segmentation_results",
           f"eval.sample_mode={sample_mode}",
           # total_epoch/train_steps must mirror the training run so the
           # restored optimizer tree matches (load_params builds the template)
           "train.total_epoch=1", f"train.train_steps={steps}",
           "train.batch_size=24",
           "eval.eval_seed=1677483078",
           f"train.resume_model={ckpt}", f"train.model_save={out_dir}"]
    run(cmd, os.path.join(out_dir, "eval_cli.log"))
    return parse_table(os.path.join(out_dir, "log_eval.txt"))


def parse_table(log_eval):
    """Headline mAP rows from the eval CLI's README-style log output."""
    with open(log_eval) as f:
        text = f.read()
    # the overall table is the first block after "mAP:"; per-category tables
    # follow, so take the FIRST match of each metric
    table = {}
    for name in HEADLINE:
        # anchor on "INFO <name>: " so '2cm' cannot match '5 degree, 2cm'
        m = re.search(rf"INFO {re.escape(name)}: (-?[\d.]+|nan)$", text,
                      re.MULTILINE)
        table[name] = float(m.group(1)) if m else float("nan")
    return table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", default="/root/synth_nocs")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--sample-mode", default="host",
                    choices=["host", "device"])
    ap.add_argument("--runs", default="/root/runs")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse existing checkpoints/run dirs")
    args = ap.parse_args()

    if not os.path.isdir(os.path.join(args.tree, "NOCS")):
        run([sys.executable, "scripts/make_synth_nocs.py", args.tree,
             "--train", "400", "--test", "50"], "/tmp/make_synth_nocs.log")

    tag = args.sample_mode
    trained_dir = os.path.join(args.runs, f"conv_r5_{tag}"
                               if tag != "host" else "conv_r5")
    init_dir = os.path.join(args.runs, f"conv_r5_init_{tag}")
    os.makedirs(trained_dir, exist_ok=True)
    os.makedirs(init_dir, exist_ok=True)

    if not args.skip_train:
        train_cli(args.tree, trained_dir, args.steps, args.sample_mode)
    # init-weights baseline: 2 warmup steps at lr*1e-3 leaves the net at init
    if not any(d.startswith("model_") for d in os.listdir(init_dir)):
        train_cli(args.tree, init_dir, 2, args.sample_mode, seed=7)

    table_trained = eval_cli(args.tree, trained_dir, trained_dir, args.steps,
                             args.sample_mode)
    table_init = eval_cli(args.tree, init_dir, init_dir, 2, args.sample_mode)

    print(f"\n=== convergence artifact (sample_mode={args.sample_mode}, "
          f"{args.steps} steps) ===")
    print(f"{'metric':>16s} | {'init':>7s} | {'trained':>7s}")
    for name in HEADLINE:
        print(f"{name:>16s} | {table_init[name]:7.1f} | "
              f"{table_trained[name]:7.1f}")
    with open(os.path.join(trained_dir, "convergence_tables.json"), "w") as f:
        json.dump({"init": table_init, "trained": table_trained,
                   "steps": args.steps, "sample_mode": args.sample_mode}, f,
                  indent=1)
    # the pass bar: the trained table must dwarf init on the coarse bins
    ok = (table_trained["3D IoU at 25"] > table_init["3D IoU at 25"] + 20
          and table_trained["10 degree, 10cm"]
          > table_init["10 degree, 10cm"] + 10)
    print("CONVERGENCE ARTIFACT", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""End-to-end quickstart: train a small model on synthetic volumes,
checkpoint it, and run the full evaluation pipeline.

    python scripts/quickstart.py [--steps 50]

Produces runs/quickstart/version_N with TensorBoard logs, checkpoints,
and evaluation/{loss,uncertainty,vis,jdet} artifacts.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, nargs=3, default=(32, 32, 32))
    ap.add_argument("--n0", type=int, default=8)
    args = ap.parse_args()

    from pulpo_tpu.config import PULPoConfig
    from pulpo_tpu.data.loader import DataLoader
    from pulpo_tpu.data.synthetic import SyntheticDataset
    from pulpo_tpu.eval.evaluator import Evaluate
    from pulpo_tpu.train.loop import Trainer

    cfg = PULPoConfig(
        input_size=tuple(args.size), total_levels=4, latent_levels=3,
        n0=args.n0, dataset="synthetic", batch_size=2,
        val_check_interval=0.5, log_every_n_steps=5,
        image_logging_frequency=1, max_epochs=10_000,
    )
    ds = SyntheticDataset(shape=cfg.input_size, n=8, segs=True, seed=0)
    train_dl = DataLoader(ds, cfg.batch_size, shuffle=True, seed=0)
    val_dl = DataLoader(ds, cfg.batch_size, shuffle=False, seed=1)

    trainer = Trainer(cfg, experiment="quickstart")
    trainer.fit(train_dl, val_dl, max_steps=args.steps)

    ev = Evaluate()
    ev.load_model(trainer.run_dir)
    perf, unc = ev.run_one_model(segs=True, N=8, task="synthetic")
    print(perf)
    print(unc)
    print(f"artifacts in {trainer.run_dir}")


if __name__ == "__main__":
    main()

"""Ensemble training CLI: k bagged count regressors
(reference: train_ensemble.py:208-254).

Each fold trains a fresh encoder + regression head (reg-only) on the other
k-1 folds with its own optimizer/schedule, saving
``reg_pt1_<fold>_<epoch>epochs.ckpt``.

Usage:
    python -m cellsegmentation_tpu.cli.train_ensemble -k 10 -e 30 -o ./output
"""

from __future__ import annotations

import argparse
import os

from cellsegmentation_tpu.cli import common
from cellsegmentation_tpu.data.lysto import EnsembleSource
from cellsegmentation_tpu.train import checkpoint as ckpt_mod
from cellsegmentation_tpu.train.trainers import train_stage1
from cellsegmentation_tpu.utils.logging import RunLogger


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="pt.1 ensemble: k bagged regressors")
    common.add_common_args(parser, default_epochs=30, default_batch=48, default_lr=5e-4)
    parser.add_argument("-E", "--encoder", type=str, default="resnet50")
    parser.add_argument("-k", "--kfold", type=int, default=10)
    parser.add_argument("-a", "--augment", action="store_true")
    parser.add_argument("--start_fold", type=int, default=0,
                        help="resume the sweep from this fold")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    data_path = common.resolve_data_path(args)
    h5 = os.path.join(data_path, "training.h5")
    num = 100 if args.debug else 0

    ensemble = EnsembleSource(
        h5, k=args.kfold, augment=args.augment, num_of_imgs=num, seed=args.seed
    )
    os.makedirs(args.output, exist_ok=True)
    logger = RunLogger(args.output)
    mesh = common.default_mesh()

    for fold in range(args.start_fold, args.kfold):
        train_view, val_view = ensemble.fold(fold)
        logger.info(
            f"=== fold {fold + 1}/{args.kfold}: train={len(train_view)} "
            f"val={len(val_view)} ==="
        )
        # fresh model + optimizer per fold (reference: per-fold Adam + scheduler)
        model, variables = common.setup_model(
            args.encoder, args, rng_seed=args.seed + fold
        )
        result = train_stage1(
            model,
            variables,
            train_view,
            val_view,
            epochs=args.epochs,
            batch_size=args.batch_size,
            lr=args.lr,
            weight_decay=args.weight_decay,
            scheduler=args.scheduler,
            test_every=args.test_every,
            heads="reg",
            encoder_name=args.encoder,
            output_dir=None,  # fold checkpoints saved below with their prefix
            logger=logger,
            mesh=mesh,
            seed=args.seed + fold,
        )
        ckpt_mod.save_checkpoint(
            args.output,
            "image",
            args.epochs,
            args.encoder,
            result.state.params,
            result.state.batch_stats,
            opt_state=result.state.opt_state,
            step=int(result.state.step),
            prefix=f"reg_pt1_{fold}",
        )
    logger.close()


if __name__ == "__main__":
    main()

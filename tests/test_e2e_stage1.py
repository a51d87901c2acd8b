"""End-to-end stage-1 slice on synthetic data: train → validate → checkpoint.

The TPU analogue of the reference's --debug smoke runs (SURVEY §4): a tiny
LystoDataSource, two epochs of the real trainer (jitted steps, masked
batches, QWK eval, checkpoint files), asserting the loop runs and learns.
"""

import glob
import os

import jax
import numpy as np
import pytest

from cellsegmentation_tpu.core.dtypes import F32_POLICY
from cellsegmentation_tpu.data import LystoDataSource, make_synthetic_h5
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.train import checkpoint as ckpt_mod
from cellsegmentation_tpu.train.trainers import train_stage1
from cellsegmentation_tpu.utils.logging import RunLogger


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    h5 = str(root / "training.h5")
    make_synthetic_h5(h5, n_images=24, image_size=64, max_cells=12, seed=3)
    train_src = LystoDataSource(h5, train=True, kfold=4, seed=0)
    val_src = LystoDataSource(h5, train=False, kfold=4)
    model = build_model("resnet18", policy=F32_POLICY)
    variables = init_variables(model, jax.random.PRNGKey(0))
    return root, train_src, val_src, model, variables


def test_stage1_trains_and_checkpoints(setup):
    root, train_src, val_src, model, variables = setup
    out = str(root / "out")
    logger = RunLogger(out, tensorboard=False)
    result = train_stage1(
        model,
        variables,
        train_src,
        val_src,
        epochs=2,
        batch_size=6,
        lr=1e-3,
        test_every=1,
        encoder_name="resnet18",
        output_dir=out,
        logger=logger,
        seed=0,
    )
    logger.close()

    # metrics exist and are finite
    assert result.last_metrics is not None
    _, mse, qwk = result.last_metrics
    assert np.isfinite(mse) and -1 <= qwk <= 1

    # CSV logs written (reference channel parity)
    assert glob.glob(os.path.join(out, "*-image-training.csv"))
    assert glob.glob(os.path.join(out, "*-image-validation.csv"))

    # checkpoints per epoch with the pt1 naming scheme
    ckpts = sorted(glob.glob(os.path.join(out, "pt1_*epochs.ckpt")))
    assert len(ckpts) == 2
    ckpt = ckpt_mod.load_checkpoint(ckpts[-1])
    assert ckpt["mode"] == "image" and ckpt["epoch"] == 2

    # the loaded checkpoint reproduces the trained params
    fresh = init_variables(model, jax.random.PRNGKey(9))
    params, _ = ckpt_mod.restore_into(fresh["params"], fresh["batch_stats"], ckpt)
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["conv1"]["kernel"]),
        np.asarray(result.state.params["encoder"]["conv1"]["kernel"]),
    )


def test_graft_entry_compiles_small():
    """Compile-check the dryrun path on the virtual 8-device mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)

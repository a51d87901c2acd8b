"""Training layer tests: masked updates, steps, schedules, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellsegmentation_tpu.core.dtypes import F32_POLICY
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.ops.tiles import tile_grid
from cellsegmentation_tpu.train import (
    checkpoint,
    create_train_state,
    make_schedule,
    steps,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_model("resnet18", policy=F32_POLICY)
    variables = init_variables(model, jax.random.PRNGKey(0))
    # host-side copies: train steps donate their state buffers, so the shared
    # fixture must hand out arrays that can never be invalidated by donation
    return model, jax.tree_util.tree_map(np.asarray, variables)


def _image_batch(rng, b=4, hw=32):
    return {
        "images": jnp.asarray(
            rng.integers(0, 255, size=(b, hw, hw, 3), dtype=np.uint8)
        ),
        "flip": jnp.zeros((b,), jnp.int32),
        "cls": jnp.asarray(rng.integers(0, 7, size=b)),
        "reg": jnp.asarray(rng.integers(0, 30, size=b).astype(np.float32)),
        "valid": jnp.ones((b,), bool),
    }


class TestStage1Step:
    def test_updates_only_image_partitions(self, model_and_vars, rng):
        model, variables = model_and_vars
        sched = make_schedule(None, 1e-3, 10, 5)
        state = create_train_state(
            variables["params"], variables["batch_stats"], "image", sched
        )
        step = steps.make_image_train_step(model)
        new_state, metrics = step(state, _image_batch(rng), jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

        def changed(a, b):
            return any(
                not np.allclose(x, y)
                for x, y in zip(
                    jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
                )
            )

        p0, p1 = variables["params"], new_state.params
        assert changed(p0["encoder"], p1["encoder"])
        assert changed(p0["fc_image_cls"], p1["fc_image_cls"])
        assert changed(p0["fc_image_reg"], p1["fc_image_reg"])
        # frozen partitions bit-identical (reference: setmode('image') turns
        # off tile/seg grads, model/resnet.py:320-324)
        assert not changed(p0["fc_tile"], p1["fc_tile"])
        assert not changed(p0["seg_decoder"], p1["seg_decoder"])

    def test_loss_decreases_on_fixed_batch(self, model_and_vars, rng):
        model, variables = model_and_vars
        sched = make_schedule(None, 1e-3, 10, 5)
        state = create_train_state(
            variables["params"], variables["batch_stats"], "image", sched
        )
        step = steps.make_image_train_step(model)
        batch = _image_batch(rng, b=8)
        first = None
        for i in range(8):
            state, metrics = step(state, batch, jax.random.PRNGKey(42))
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first

    def test_padding_mask_excluded(self, model_and_vars, rng):
        model, variables = model_and_vars
        sched = make_schedule(None, 1e-3, 10, 5)
        step = steps.make_image_train_step(model)
        batch = _image_batch(rng, b=4)
        # poison the padded sample; metrics must be unaffected
        state1 = create_train_state(
            variables["params"], variables["batch_stats"], "image", sched
        )
        valid = jnp.asarray([True, True, True, False])
        b1 = dict(batch, valid=valid)
        _, m1 = step(state1, b1, jax.random.PRNGKey(0))
        poisoned = np.asarray(batch["reg"]).copy()
        poisoned[3] = 1e6
        state2 = create_train_state(
            variables["params"], variables["batch_stats"], "image", sched
        )
        b2 = dict(batch, valid=valid, reg=jnp.asarray(poisoned))
        _, m2 = step(state2, b2, jax.random.PRNGKey(0))
        assert float(m1["loss_reg"]) == pytest.approx(float(m2["loss_reg"]), rel=1e-6)


class TestStage2Step:
    def test_tile_step_freezes_encoder(self, model_and_vars, rng):
        model, variables = model_and_vars
        sched = make_schedule(None, 1e-3, 10, 5)
        state = create_train_state(
            variables["params"], variables["batch_stats"], "tile", sched
        )
        step = steps.make_tile_train_step(model, tile_size=16)
        images_dev = jnp.asarray(
            rng.integers(0, 255, size=(3, 64, 64, 3), dtype=np.uint8)
        )
        batch = {
            "img_idx": jnp.asarray([0, 1, 2, 0], jnp.int32),
            "xs": jnp.asarray([0, 16, 32, 48], jnp.int32),
            "ys": jnp.asarray([0, 8, 16, 48], jnp.int32),
            "flip": jnp.asarray([0, 1, 2, 3], jnp.int32),
            "label": jnp.asarray([0, 1, 1, 0], jnp.int32),
            "valid": jnp.ones(4, bool),
        }
        new_state, metrics = step(state, images_dev, batch)
        assert np.isfinite(float(metrics["loss"]))
        # only fc_tile moves; encoder params AND batch stats frozen
        for part in ("encoder", "fc_image_cls", "fc_image_reg", "seg_decoder"):
            for a, b in zip(
                jax.tree_util.tree_leaves(variables["params"][part]),
                jax.tree_util.tree_leaves(new_state.params[part]),
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        tile_changed = any(
            not np.allclose(a, b)
            for a, b in zip(
                jax.tree_util.tree_leaves(variables["params"]["fc_tile"]),
                jax.tree_util.tree_leaves(new_state.params["fc_tile"]),
            )
        )
        assert tile_changed
        for a, b in zip(
            jax.tree_util.tree_leaves(variables["batch_stats"]),
            jax.tree_util.tree_leaves(new_state.batch_stats),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestStage3Step:
    def test_seg_step_trains_decoder_only(self, model_and_vars, rng):
        model, variables = model_and_vars
        sched = make_schedule(None, 1e-3, 10, 5)
        state = create_train_state(
            variables["params"], variables["batch_stats"], "segment", sched
        )
        step = steps.make_seg_train_step(model)
        batch = {
            "images": jnp.asarray(
                rng.integers(0, 255, size=(2, 32, 32, 3), dtype=np.uint8)
            ),
            "flip": jnp.zeros((2,), jnp.int32),
            "mask": jnp.asarray(rng.integers(0, 2, size=(2, 32, 32)), jnp.int32),
            "valid": jnp.ones((2,), bool),
        }
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert 0 <= float(metrics["loss_dice"]) <= 1
        assert float(metrics["loss_ce"]) > 0
        # encoder params frozen...
        for a, b in zip(
            jax.tree_util.tree_leaves(variables["params"]["encoder"]),
            jax.tree_util.tree_leaves(new_state.params["encoder"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # ...but encoder batch stats update (reference stage-3 trains in
        # module.train() mode; train/train.py:172-207)
        stats_changed = any(
            not np.allclose(a, b)
            for a, b in zip(
                jax.tree_util.tree_leaves(variables["batch_stats"]["encoder"]),
                jax.tree_util.tree_leaves(new_state.batch_stats["encoder"]),
            )
        )
        assert stats_changed


class TestSchedules:
    def test_apply_gradients_lr_follows_state_step(self):
        """The applied update must be schedule(state.step)·grad — the
        optimizer core runs at unit lr and apply_gradients scales by the
        state's step (train/state.py), so the trainers' epoch-boundary and
        resume step realignments genuinely move the LR position (an
        optax-internal schedule count would ignore them)."""
        from cellsegmentation_tpu.train.state import create_train_state

        sched = lambda s: jnp.where(s < 3, 0.5, 0.125)  # noqa: E731
        params = {
            "fc_tile": {"w": jnp.zeros((4,), jnp.float32)},
            "encoder": {"w": jnp.zeros((4,), jnp.float32)},
        }
        state = create_train_state(
            params, {}, "tile", sched, use_sgd=True, weight_decay=0.0
        )
        g = {
            "fc_tile": {"w": jnp.ones((4,), jnp.float32)},
            "encoder": {"w": jnp.ones((4,), jnp.float32)},
        }
        s1 = state.apply_gradients(g, {})
        # step 0: lr 0.5 (momentum trace == grad on the first step)
        np.testing.assert_allclose(np.asarray(s1.params["fc_tile"]["w"]),
                                   -0.5, rtol=1e-6)
        # frozen partition: no update
        np.testing.assert_allclose(np.asarray(s1.params["encoder"]["w"]), 0.0)
        # realigning the step counter moves the LR (fresh state: no trace)
        state2 = state.replace(step=jnp.asarray(7, jnp.int32))
        s2 = state2.apply_gradients(g, {})
        np.testing.assert_allclose(np.asarray(s2.params["fc_tile"]["w"]),
                                   -0.125, rtol=1e-6)

    def test_onecycle_peaks_at_lr(self):
        sched = make_schedule("OneCycleLR", 1e-3, epochs=10, steps_per_epoch=10)
        vals = [float(sched(s)) for s in range(100)]
        assert max(vals) == pytest.approx(1e-3, rel=1e-2)
        assert vals[0] == pytest.approx(1e-3 / 25.0, rel=1e-2)

    def test_onecycle_finite_at_tiny_totals(self):
        """optax's onecycle has an empty warmup interval below 4 total
        steps (int(0.3*total) == 0) and returns nan at EVERY step — a
        1-epoch debug run would silently nan-train without the clamp."""
        for epochs, spe in [(1, 1), (1, 3), (2, 1)]:
            sched = make_schedule("OneCycleLR", 1e-3, epochs, spe)
            assert all(np.isfinite(float(sched(s))) for s in range(5)), (
                epochs, spe
            )

    def test_exponential_steps_per_epoch(self):
        sched = make_schedule("ExponentialLR", 1.0, epochs=5, steps_per_epoch=7)
        assert float(sched(0)) == pytest.approx(1.0)
        assert float(sched(6)) == pytest.approx(1.0)  # same epoch
        assert float(sched(7)) == pytest.approx(0.9)
        assert float(sched(14)) == pytest.approx(0.81)

    def test_cosine_warm_restarts(self):
        sched = make_schedule(
            "CosineAnnealingWarmRestarts", 1.0, epochs=30, steps_per_epoch=1
        )
        assert float(sched(0)) == pytest.approx(1.0)
        assert float(sched(10)) == pytest.approx(1.0)  # restart at T_0=10
        assert float(sched(5)) == pytest.approx(0.5, abs=1e-6)

    def test_cosine_t0_per_stage(self):
        """Stages 2-3 restart every 5 epochs (reference train_tile.py:299,
        train_seg.py:308), stage 1 every 10 (train_image.py:504)."""
        sched = make_schedule(
            "CosineAnnealingWarmRestarts", 1.0, epochs=30, steps_per_epoch=1,
            t0=5,
        )
        assert float(sched(5)) == pytest.approx(1.0)  # restart at T_0=5
        assert float(sched(2)) < 1.0

    def test_stage2_onecycle_peak_survives_varying_selection(
        self, model_and_vars, tmp_path, monkeypatch
    ):
        """The stage-2 schedule is sized from a nominal epoch length while
        the real batch count varies with the selection; the trainer must
        realign the step counter at each epoch boundary so the OneCycle
        peak keeps its placement (reference steps per real batch over a
        first-epoch-sized scheduler, train_tile.py:293 +
        train/train.py:38-45)."""
        from cellsegmentation_tpu.data import LystoDataSource, make_synthetic_h5
        from cellsegmentation_tpu.train import steps as steps_mod
        from cellsegmentation_tpu.train.trainers import train_stage2
        from cellsegmentation_tpu.utils.logging import RunLogger

        model, variables = model_and_vars
        h5 = str(tmp_path / "training.h5")
        make_synthetic_h5(h5, n_images=10, image_size=32, max_cells=5, seed=3)
        src = LystoDataSource(h5, train=True, kfold=None, seed=0)

        seen_steps = []
        real_factory = steps_mod.make_tile_train_step

        def recording_factory(*a, **k):
            step_fn = real_factory(*a, **k)

            def wrapped(state, images, batch):
                seen_steps.append(int(state.step))
                return step_fn(state, images, batch)

            return wrapped

        monkeypatch.setattr(steps_mod, "make_tile_train_step",
                            recording_factory)

        from cellsegmentation_tpu import infer as infer_mod

        real_sample = infer_mod.sample_topk

        def marking_sample(*a, **k):
            seen_steps.append("epoch")  # epoch boundary marker
            return real_sample(*a, **k)

        monkeypatch.setattr(infer_mod, "sample_topk", marking_sample)
        logger = RunLogger(str(tmp_path), tensorboard=False)
        train_stage2(
            model, dict(variables), src, None,
            epochs=3, tile_batch_size=64, image_batch=8,
            tile_size=16, interval=8, tiles_per_pos=2, topk_neg=4,
            pos_neg_ratio=0.5, threshold=0.5, lr=1e-3,
            scheduler="OneCycleLR",
            encoder_name="resnet18", output_dir=None, logger=logger, seed=0,
        )
        logger.close()

        n = len(src)
        nominal = max(1, (n * (4 + 1)) // 64)
        # every epoch's first update sits exactly at its nominal boundary,
        # regardless of how many batches the previous epochs really ran
        epochs_seen = []
        for s in seen_steps:
            if s == "epoch":
                epochs_seen.append([])
            else:
                epochs_seen[-1].append(s)
        assert len(epochs_seen) == 3
        for e, steps_in_epoch in enumerate(epochs_seen):
            assert steps_in_epoch, f"epoch {e} ran no batches"
            assert steps_in_epoch[0] == e * nominal, (seen_steps, nominal)


class TestResume:
    def test_stage1_resume_fast_forwards_schedule(self, model_and_vars, tmp_path):
        """Resuming at epoch N must continue the LR schedule, not restart it
        (reference restores scheduler.last_epoch, train_image.py:514-517)."""
        from cellsegmentation_tpu.data import LystoDataSource, make_synthetic_h5
        from cellsegmentation_tpu.train.trainers import train_stage1
        from cellsegmentation_tpu.utils.logging import RunLogger

        model, variables = model_and_vars
        h5 = str(tmp_path / "training.h5")
        make_synthetic_h5(h5, n_images=8, image_size=32, max_cells=5, seed=1)
        src = LystoDataSource(h5, train=True, kfold=4)
        logger = RunLogger(str(tmp_path), tensorboard=False)
        result = train_stage1(
            model, dict(variables), src, None,
            epochs=3, batch_size=4, lr=1.0, scheduler="ExponentialLR",
            encoder_name="resnet18", output_dir=None, logger=logger,
            seed=0, last_epoch=2,  # resume into the final epoch
        )
        logger.close()
        # 2 epochs × 2 steps/epoch skipped + 2 steps run = step 6
        assert int(result.state.step) == 6

    def test_resume_matches_uninterrupted_run(self, model_and_vars, tmp_path):
        """N epochs straight == N/2 + checkpoint + resume, bit-for-bit params:
        optimizer momentum, schedule position, shuffle stream and dropout rng
        are all restored (reference: train_image.py:372-386,463-474 saves and
        restores optimizer+scheduler state on -r)."""
        import os

        from cellsegmentation_tpu.data import LystoDataSource, make_synthetic_h5
        from cellsegmentation_tpu.train.trainers import train_stage1
        from cellsegmentation_tpu.utils.logging import RunLogger

        model, variables = model_and_vars
        h5 = str(tmp_path / "training.h5")
        make_synthetic_h5(h5, n_images=8, image_size=32, max_cells=5, seed=1)

        def fresh_vars():
            # steps donate their state buffers; give each run its own leaves
            return jax.tree_util.tree_map(np.array, variables)

        common = dict(
            epochs=2, batch_size=4, lr=1e-3, scheduler="OneCycleLR",
            encoder_name="resnet18", seed=0,
        )
        logger = RunLogger(str(tmp_path), tensorboard=False)

        # the straight run checkpoints every epoch, so its epoch-1 file IS
        # the interrupted state to resume from
        out = str(tmp_path / "run")
        straight = train_stage1(
            model, fresh_vars(), LystoDataSource(h5, train=True, kfold=4),
            None, output_dir=out, logger=logger, **common,
        )
        ckpt = checkpoint.load_checkpoint(os.path.join(out, "pt1_1epochs.ckpt"))
        assert ckpt["optimizer"] is not None
        fresh = fresh_vars()
        params, stats = checkpoint.restore_into(
            fresh["params"], fresh["batch_stats"], ckpt
        )
        resumed = train_stage1(
            model, {"params": params, "batch_stats": stats},
            LystoDataSource(h5, train=True, kfold=4), None,
            output_dir=None, logger=logger,
            last_epoch=1, resume_opt_state=ckpt["optimizer"], **common,
        )
        logger.close()
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            straight.state.params,
            resumed.state.params,
        )


class TestCheckpoint:
    def test_roundtrip_and_stage_handoff(self, model_and_vars, tmp_path):
        model, variables = model_and_vars
        params, stats = variables["params"], variables["batch_stats"]
        path = checkpoint.save_checkpoint(
            str(tmp_path), "image", 3, "resnet18", params, stats, step=120
        )
        assert path.endswith("pt1_3epochs.ckpt")
        ckpt = checkpoint.load_checkpoint(path)
        assert ckpt["mode"] == "image" and ckpt["encoder"] == "resnet18"
        # stage-1 file excludes tile/seg heads (reference: train_image.py:374-376)
        assert set(ckpt["state_dict"]["params"]) == {
            "encoder",
            "fc_image_cls",
            "fc_image_reg",
        }

        # handoff: restore into a freshly seeded tree; encoder comes from the
        # file, fc_tile stays freshly initialized
        fresh = init_variables(model, jax.random.PRNGKey(7))
        rp, rs = checkpoint.restore_into(
            fresh["params"], fresh["batch_stats"], ckpt
        )
        np.testing.assert_array_equal(
            np.asarray(rp["encoder"]["conv1"]["kernel"]),
            np.asarray(params["encoder"]["conv1"]["kernel"]),
        )
        np.testing.assert_array_equal(
            np.asarray(rp["fc_tile"]["Dense_0"]["kernel"]),
            np.asarray(fresh["params"]["fc_tile"]["Dense_0"]["kernel"]),
        )

"""CLI-level tests: drive every entry point in-process on synthetic data.

The CPU analogue of the reference's --debug smoke runs for the test CLIs
and the ensemble (SURVEY §4).
"""

import csv
import glob
import os

import numpy as np
import pytest

from cellsegmentation_tpu.data import make_synthetic_h5
from cellsegmentation_tpu.data.lysto import EnsembleSource


HW = 48


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    make_synthetic_h5(str(root / "training.h5"), n_images=12, image_size=HW, seed=2)
    make_synthetic_h5(str(root / "test.h5"), n_images=6, image_size=HW, seed=7)
    return root


@pytest.fixture(scope="module")
def trained(workspace):
    """Train 1 epoch of each stage via the real CLIs; return ckpt paths."""
    from cellsegmentation_tpu.cli import train_image, train_seg, train_tile

    out = str(workspace / "out")
    base = ["--data_path", str(workspace), "-o", out, "--f32"]
    train_image.main(base + ["-E", "resnet18", "-e", "1", "-B", "4", "-k", "4"])
    pt1 = sorted(glob.glob(os.path.join(out, "pt1_*.ckpt")))[-1]
    train_tile.main(
        base + ["-m", pt1, "-e", "1", "-b", "256", "-B", "4", "-t", "16",
                "-i", "16", "-n", "5"]
    )
    pt2 = sorted(glob.glob(os.path.join(out, "pt2_*.ckpt")))[-1]
    train_seg.main(
        base + ["-m", pt2, "-e", "1", "-t", "8", "-i", "8", "-c", "0.2",
                "-B", "4", "-b", "4"]
    )
    pt3 = sorted(glob.glob(os.path.join(out, "pt3_*.ckpt")))[-1]
    return workspace, out, pt1, pt2, pt3


class TestTestCLIs:
    def test_test_count(self, trained):
        workspace, out, pt1, _, _ = trained
        from cellsegmentation_tpu.cli import test_count

        dst = str(workspace / "tc")
        test_count.main(
            ["-m", pt1, "--data_path", str(workspace), "-o", dst, "--f32",
             "-B", "4", "--cls_limit"]
        )
        csvs = glob.glob(os.path.join(dst, "*-count-e*.csv"))
        assert csvs
        with open(csvs[0]) as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["id", "count", "organ"]
        assert len(rows) == 7  # 6 test images + header

    def test_test_tile_heatmaps(self, trained):
        workspace, out, _, pt2, _ = trained
        from cellsegmentation_tpu.cli import test_tile

        dst = str(workspace / "tt")
        test_tile.main(
            ["-m", pt2, "--data_path", str(workspace), "-o", dst, "--f32",
             "-B", "4", "-t", "16", "-i", "16", "-c", "0.1", "--reg_limit"]
        )
        assert glob.glob(os.path.join(dst, "test_*.png"))
        assert glob.glob(os.path.join(dst, "*-pred-*.csv"))

    def test_test_seg_draw_masks(self, trained):
        workspace, out, _, _, pt3 = trained
        from cellsegmentation_tpu.cli import test_seg

        dst = str(workspace / "ts")
        test_seg.main(
            ["-m", pt3, "--data_path", str(workspace / "test.h5"), "-o", dst,
             "--f32", "--draw_masks", "-B", "4", "-c", "0.5", "--soft_mask"]
        )
        assert glob.glob(os.path.join(dst, "test_*.png"))
        assert glob.glob(os.path.join(dst, "soft", "*.png"))

    def test_test_seg_detect(self, trained, tmp_path):
        workspace, out, _, _, pt3 = trained
        from cellsegmentation_tpu.cli import test_seg
        import cv2

        # ROI directory input: two pngs
        roi = tmp_path / "roi"
        roi.mkdir()
        rng = np.random.default_rng(0)
        for i in range(2):
            img = rng.integers(0, 255, size=(HW, HW, 3), dtype=np.uint8)
            cv2.imwrite(str(roi / f"slide_{i}.png"), img)
        dst = str(tmp_path / "det")
        test_seg.main(
            ["-m", pt3, "--data_path", str(roi), "-o", dst, "--f32",
             "--detect", "-B", "2"]
        )
        csvs = glob.glob(os.path.join(dst, "detect", "*-location.csv"))
        assert csvs
        with open(csvs[0]) as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["image_id", "x", "y"]
        assert glob.glob(os.path.join(dst, "detect", "mask_*.png"))

    def test_detect_on_h5_patches(self, trained, tmp_path):
        """Detection over an .h5 patch source (reference's third source kind,
        dataset/dataset.py:555-564)."""
        workspace, out, _, _, pt3 = trained
        from cellsegmentation_tpu.cli import test_seg

        dst = str(tmp_path / "det_h5")
        test_seg.main(
            ["-m", pt3, "--data_path", str(workspace / "test.h5"), "-o", dst,
             "--f32", "--detect", "-B", "3"]
        )
        csvs = glob.glob(os.path.join(dst, "detect", "*-location.csv"))
        assert csvs
        masks = glob.glob(os.path.join(dst, "detect", "mask_*.png"))
        assert len(masks) == 6  # one stitched mask per h5 image

    def test_point_eval(self, trained, tmp_path):
        workspace, out, _, _, pt3 = trained
        from cellsegmentation_tpu.cli import test_seg
        import cv2

        # point-annotated layout
        root = tmp_path / "points_root"
        (root / "images").mkdir(parents=True)
        (root / "masks").mkdir()
        (root / "points").mkdir()
        rng = np.random.default_rng(1)
        for i in range(2):
            img = rng.integers(0, 255, size=(HW, HW, 3), dtype=np.uint8)
            cv2.imwrite(str(root / "images" / f"test_{i}.png"), img)
            mask = (rng.random((HW, HW)) > 0.7).astype(np.uint8) * 255
            cv2.imwrite(str(root / "masks" / f"test_{i}.png"), mask)
            np.savetxt(
                str(root / "points" / f"test_{i}.tsv"),
                rng.integers(0, HW, size=(3, 2)),
                delimiter="\t", fmt="%d",
            )
        dst = str(tmp_path / "pe")
        test_seg.main(
            ["-m", pt3, "--data_path", str(root), "-o", dst, "--f32",
             "-c", "0.5"]
        )
        with open(os.path.join(dst, "center.csv")) as f:
            rows = list(csv.reader(f))
        assert rows[0][:3] == ["id", "count", "tp"]
        assert len(rows) == 3

    def test_qupath_baseline(self, trained, tmp_path):
        workspace, out, _, _, pt3 = trained
        from cellsegmentation_tpu.cli import test_seg
        import cv2, json

        root = tmp_path / "qp_root"
        (root / "images").mkdir(parents=True)
        (root / "points").mkdir()
        qp = tmp_path / "qp"
        qp.mkdir()
        img = np.zeros((HW, HW, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / "test_0.png"), img)
        np.savetxt(str(root / "points" / "test_0.tsv"), [[10, 10], [30, 30]],
                   delimiter="\t", fmt="%d")
        gj = {"features": [
            {"geometry": {"type": "Point", "coordinates": [10, 11]}},
            {"geometry": {"type": "Polygon",
                          "coordinates": [[[28, 28], [32, 28], [32, 32], [28, 32]]]}},
        ]}
        with open(qp / "test_0.geojson", "w") as f:
            json.dump(gj, f)
        dst = str(tmp_path / "qpe")
        test_seg.main(
            ["-m", pt3, "--data_path", str(root), "-o", dst, "--f32",
             "--test_qupath", str(qp)]
        )
        with open(os.path.join(dst, "qupath-center.csv")) as f:
            rows = list(csv.reader(f))
        assert rows[1][1] == "2"  # both detections matched -> tp=2


class TestEnsemble:
    def test_ensemble_split_sizes(self, workspace):
        src = EnsembleSource(str(workspace / "training.h5"), k=5)
        n = len(src.data)
        sizes = []
        for i in range(5):
            tr, va = src.fold(i)
            assert len(tr) + len(va) == n
            sizes.append(len(va))
        # ⌈N/k⌉ for the first N%k folds (reference divmod split)
        assert sizes == sorted(sizes, reverse=True)
        assert sum(sizes) == n

    def test_train_and_test_ensemble(self, workspace):
        """Runs the ensemble CLIs as real subprocesses — the true `python -m`
        surface. (The round-1 in-process SIGABRT was attributed to the
        XLA:CPU persistent-cache loader, disabled since; in-process mesh
        coverage lives in test_parallel.TestEnsembleMeshInProcess.)"""
        import subprocess
        import sys

        env = dict(os.environ)
        env["CST_PLATFORM"] = "cpu"
        env["CST_DISABLE_TB"] = "1"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

        out = str(workspace / "ens")
        r = subprocess.run(
            [sys.executable, "-m", "cellsegmentation_tpu.cli.train_ensemble",
             "--data_path", str(workspace), "-o", out, "--f32", "-E",
             "resnet18", "-k", "2", "-e", "1", "-B", "4", "--test_every", "1"],
            env=env, cwd="/root/repo", capture_output=True, text=True,
            timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        ckpts = glob.glob(os.path.join(out, "reg_pt1_*_1epochs.ckpt"))
        assert len(ckpts) == 2
        dst = str(workspace / "ens_out")
        r = subprocess.run(
            [sys.executable, "-m", "cellsegmentation_tpu.cli.test_ensemble",
             "-m", out, "-e", "1", "--data_path", str(workspace), "-o", dst,
             "--f32", "-B", "4"],
            env=env, cwd="/root/repo", capture_output=True, text=True,
            timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        csvs = glob.glob(os.path.join(dst, "*-count-e1.csv"))
        assert csvs
        with open(csvs[0]) as f:
            rows = list(csv.reader(f))
        assert len(rows) == 7


class TestBenchGate:
    """bench.py --quick regression gate (VERDICT r2 weak #4): a 10%
    hot-loop slowdown must fail the gate; best-of-3 noise must not."""

    def test_catches_synthetic_10pct_slowdown(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench", "/root/repo/bench.py"
        )
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)

        ref = 3600.0
        assert bench.gate_fails(ref * 0.89, ref)      # 11% down: caught
        assert bench.gate_fails(ref * 0.90 - 1, ref)  # just past the line
        assert not bench.gate_fails(ref * 0.95, ref)  # noise band: passes
        assert not bench.gate_fails(ref, ref)
        assert bench.GATE_FRACTION >= 0.90

    def _run_main(self, bench, monkeypatch, tmp_path, argv, resolved,
                  value=3000.0):
        """Drive bench.main with the measurement stubbed out."""
        import os

        monkeypatch.setattr(bench, "REF_PATH", str(tmp_path / "ref.json"))
        monkeypatch.setattr(
            bench, "build_step",
            lambda engine, encoder="resnet50": (
                None, None, None, None, 192, resolved
            ),
        )
        monkeypatch.setattr(
            bench, "measure", lambda *a, **k: 192.0 / value
        )
        monkeypatch.setattr("sys.argv", ["bench.py"] + argv)
        import jax
        monkeypatch.setattr(
            jax.config, "update", lambda *a, **k: None
        )
        bench.main()
        return os.path.join(str(tmp_path), "ref.json")

    def test_record_stores_resolved_engine_and_stale_record_fails(
        self, monkeypatch, tmp_path
    ):
        """VERDICT r3 weak #1: BENCH_REF must carry the RESOLVED chain,
        and an auto --quick run whose resolution differs from the record
        must fail loudly instead of silently skipping the gate."""
        import importlib.util
        import json

        import pytest

        spec = importlib.util.spec_from_file_location(
            "bench", "/root/repo/bench.py"
        )
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)

        # --record under engine=auto writes what auto RESOLVED to
        ref_path = self._run_main(
            bench, monkeypatch, tmp_path,
            ["--engine", "auto", "--record"], resolved="q8dg",
        )
        with open(ref_path) as f:
            rec = json.load(f)
        assert rec["engine"] == "q8dg"
        assert rec["encoder"] == "resnet50"

        # same resolution + no regression: gate passes quietly
        self._run_main(
            bench, monkeypatch, tmp_path,
            ["--engine", "auto", "--quick"], resolved="q8dg",
        )

        # auto now resolves to a different chain than the record: the
        # record is stale and the quick run must exit 1
        with pytest.raises(SystemExit) as exc:
            self._run_main(
                bench, monkeypatch, tmp_path,
                ["--engine", "auto", "--quick"], resolved="q8",
            )
        assert exc.value.code == 1

        # an EXPLICIT non-auto engine mismatch only skips the gate
        self._run_main(
            bench, monkeypatch, tmp_path,
            ["--engine", "flax", "--quick"], resolved="flax",
        )

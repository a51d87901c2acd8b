"""Turnkey torchvision conversion (tools/convert_torchvision.py).

Golden guarantees for the QWK-0.93 reproduction recipe (the reference
bootstraps from torchvision ImageNet checkpoints, model/resnet.py:336-361):

- the expected torchvision key schema is exactly what the converter
  consumes, and the converted tree drops into our freshly-initialized
  model with NO key or shape mismatches (the "first real-data user debugs
  key mismatches by hand" failure mode);
- schema violations (missing/extra keys, wrong shapes, wrong arch) are
  reported as explicit human-readable problems before conversion.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from cellsegmentation_tpu.utils import torch_convert as tc


def _synthetic_sd(arch: str, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    sd = {}
    for key, shape in tc.torchvision_key_schema(arch).items():
        if key.endswith("running_var"):
            sd[key] = rng.uniform(0.5, 2.0, shape).astype(np.float32)
        else:
            sd[key] = rng.normal(0, 0.05, shape).astype(np.float32)
    return sd


@pytest.mark.parametrize("arch", sorted(tc._ARCHS))
def test_converted_tree_matches_model_init_exactly(arch):
    """Converted (params, batch_stats) must be structurally IDENTICAL to the
    model's freshly initialized encoder subtree: same key paths, same
    shapes. This is the no-key-mismatch guarantee for real torchvision
    files (their schema is pinned by torchvision_key_schema)."""
    from cellsegmentation_tpu.models import build_model, init_variables

    sd = _synthetic_sd(arch)
    assert tc.validate_torchvision_state_dict(arch, sd) == []
    stage_sizes, bottleneck = tc._ARCHS[arch]
    params, stats = tc.convert_resnet_encoder(sd, stage_sizes, bottleneck)

    model = build_model(arch)
    variables = init_variables(model, jax.random.PRNGKey(0))

    def paths(tree, prefix=()):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                out.update(paths(v, prefix + (k,)))
            return out
        return {prefix: np.asarray(tree).shape}

    assert paths(params) == paths(variables["params"]["encoder"])
    assert paths(stats) == paths(variables["batch_stats"]["encoder"])


def test_validation_reports_missing_extra_and_shapes():
    sd = _synthetic_sd("resnet18")
    del sd["layer2.0.conv1.weight"]
    sd["layer9.bogus"] = np.zeros((1,), np.float32)
    sd["conv1.weight"] = np.zeros((64, 3, 3, 3), np.float32)
    problems = "\n".join(tc.validate_torchvision_state_dict("resnet18", sd))
    assert "layer2.0.conv1.weight" in problems
    assert "layer9.bogus" in problems
    assert "shape mismatch conv1.weight" in problems


def test_validation_hints_wrong_arch():
    sd = _synthetic_sd("resnext50_32x4d")
    problems = tc.validate_torchvision_state_dict("resnet50", sd)
    assert any("resnext50_32x4d" in p and "wrong --arch" in p
               for p in problems)
    # num_batches_tracked keys are tolerated silently
    sd_ok = _synthetic_sd("resnet50")
    sd_ok["bn1.num_batches_tracked"] = np.asarray(7)
    assert tc.validate_torchvision_state_dict("resnet50", sd_ok) == []


def test_cli_end_to_end_torchvision(tmp_path):
    """torch.save'd synthetic resnet18 ImageNet file -> CLI -> loadable
    .ckpt whose encoder merges into a fresh train state."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "tools")
    try:
        import convert_torchvision as cli
    finally:
        sys.path.pop(0)

    sd = {k: torch.from_numpy(v) for k, v in _synthetic_sd("resnet18").items()}
    pth = tmp_path / "resnet18-imagenet.pth"
    torch.save(sd, str(pth))
    out = tmp_path / "resnet18_imagenet.ckpt"
    cli.main(["resnet18", str(pth), str(out)])
    assert out.exists()

    from cellsegmentation_tpu.models import build_model, init_variables
    from cellsegmentation_tpu.train import checkpoint as ckpt_mod

    model = build_model("resnet18")
    variables = init_variables(model, jax.random.PRNGKey(0))
    loaded = ckpt_mod.load_checkpoint(str(out))
    params, stats = ckpt_mod.restore_into(
        variables["params"], variables["batch_stats"], loaded
    )
    got = np.asarray(params["encoder"]["conv1"]["kernel"], np.float32)
    want = np.transpose(np.asarray(sd["conv1.weight"]), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cli_rejects_wrong_schema(tmp_path):
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "tools")
    try:
        import convert_torchvision as cli
    finally:
        sys.path.pop(0)

    sd = {k: torch.from_numpy(v) for k, v in _synthetic_sd("resnet18").items()}
    pth = tmp_path / "wrong.pth"
    torch.save(sd, str(pth))
    with pytest.raises(SystemExit) as e:
        cli.main(["resnet50", str(pth), str(tmp_path / "out.ckpt")])
    assert e.value.code == 2

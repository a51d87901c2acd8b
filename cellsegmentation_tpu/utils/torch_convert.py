"""torchvision → Flax weight conversion for ImageNet-pretrained encoders.

The reference hits QWK 0.93 starting from torchvision ImageNet checkpoints
(reference: model/resnet.py:336-361 loads model_zoo weights with
strict=False then re-inits fc_tile). This environment has no egress, so the
converter runs on a locally provided ``.pth`` state dict:

    python -m cellsegmentation_tpu.utils.torch_convert resnet50 \
        resnet50-19c8e357.pth out.ckpt

Mapping (torch -> flax, NCHW -> NHWC):
- conv weight [O, I, kh, kw] -> kernel [kh, kw, I, O]
- bn {weight, bias, running_mean, running_var} ->
  params {scale, bias} + batch_stats {mean, var}
- our encoder layout layer<i>_<b> mirrors torch layer<i>.<b>; the bottleneck
  convs are ConvBNAct_0..2 and the downsample is ConvBNAct_3 (basic blocks:
  0..1 and downsample 2).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def convert_resnet_encoder(
    state_dict: Mapping[str, "object"],
    stage_sizes: tuple[int, ...],
    bottleneck: bool,
) -> tuple[dict, dict]:
    """torchvision ResNet/ResNeXt state dict -> (params, batch_stats) for the
    'encoder' subtree of our MILNet."""
    params: dict = {}
    stats: dict = {}

    def copy_bn(torch_prefix: str, flax_path: list[str]) -> None:
        _set(params, flax_path + ["scale"], np.asarray(state_dict[f"{torch_prefix}.weight"]))
        _set(params, flax_path + ["bias"], np.asarray(state_dict[f"{torch_prefix}.bias"]))
        _set(stats, flax_path + ["mean"], np.asarray(state_dict[f"{torch_prefix}.running_mean"]))
        _set(stats, flax_path + ["var"], np.asarray(state_dict[f"{torch_prefix}.running_var"]))

    _set(params, ["conv1", "kernel"], _conv(state_dict["conv1.weight"]))
    copy_bn("bn1", ["bn1"])

    n_convs = 3 if bottleneck else 2
    for stage, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            tprefix = f"layer{stage}.{b}"
            fblock = f"layer{stage}_{b}"
            for ci in range(n_convs):
                cba = f"ConvBNAct_{ci}"
                _set(
                    params, [fblock, cba, "Conv_0", "kernel"],
                    _conv(state_dict[f"{tprefix}.conv{ci + 1}.weight"]),
                )
                copy_bn(f"{tprefix}.bn{ci + 1}", [fblock, cba, "BatchNorm_0"])
            if f"{tprefix}.downsample.0.weight" in state_dict:
                cba = f"ConvBNAct_{n_convs}"
                _set(
                    params, [fblock, cba, "Conv_0", "kernel"],
                    _conv(state_dict[f"{tprefix}.downsample.0.weight"]),
                )
                copy_bn(f"{tprefix}.downsample.1", [fblock, cba, "BatchNorm_0"])
    return params, stats


def convert_milnet_heads(
    state_dict: Mapping[str, "object"],
) -> tuple[dict, dict]:
    """Reference MILNet head/decoder weights -> (params, batch_stats) for the
    fc_tile / fc_image_cls / fc_image_reg / seg_decoder subtrees.

    Reference module schema (reference: model/resnet.py:121-164):
    - fc_tile = Sequential(Flatten, Linear)                      -> .1.weight
    - fc_image_* = Sequential(Flatten, BN1d, Dropout, ReLU, Linear(64),
      BN1d, Dropout, Linear(out)[, ReLU])                        -> .1/.4/.5/.7
    - upconv<k> = Sequential(Conv2d(bias=True), BN2d, ReLU); our ConvBNAct
      conv is bias-free, so the torch conv bias folds into the BN running
      mean (BN(z + b) == BN'(z) with mean' = mean - b);
    - seg_out_conv = Conv2d(64, 2, 1) with bias (matches our final nn.Conv).
    """
    params: dict = {}
    stats: dict = {}

    def linear(tp: str, path: list[str]) -> None:
        _set(params, path + ["kernel"], np.asarray(state_dict[f"{tp}.weight"]).T)
        _set(params, path + ["bias"], np.asarray(state_dict[f"{tp}.bias"]))

    def bn(tp: str, path: list[str], mean_shift=None) -> None:
        _set(params, path + ["scale"], np.asarray(state_dict[f"{tp}.weight"]))
        _set(params, path + ["bias"], np.asarray(state_dict[f"{tp}.bias"]))
        mean = np.asarray(state_dict[f"{tp}.running_mean"])
        if mean_shift is not None:
            mean = mean - mean_shift
        _set(stats, path + ["mean"], mean)
        _set(stats, path + ["var"], np.asarray(state_dict[f"{tp}.running_var"]))

    linear("fc_tile.1", ["fc_tile", "Dense_0"])
    for head in ("fc_image_cls", "fc_image_reg"):
        bn(f"{head}.1", [head, "BatchNorm_0"])
        linear(f"{head}.4", [head, "Dense_0"])
        bn(f"{head}.5", [head, "BatchNorm_1"])
        linear(f"{head}.7", [head, "Dense_1"])

    if "seg_out_conv.weight" in state_dict:
        for k in range(1, 9):
            cba = ["seg_decoder", f"ConvBNAct_{k - 1}"]
            _set(
                params, cba + ["Conv_0", "kernel"],
                _conv(state_dict[f"upconv{k}.0.weight"]),
            )
            bn(
                f"upconv{k}.1", cba + ["BatchNorm_0"],
                mean_shift=np.asarray(state_dict[f"upconv{k}.0.bias"]),
            )
        _set(
            params, ["seg_decoder", "Conv_0", "kernel"],
            _conv(state_dict["seg_out_conv.weight"]),
        )
        _set(
            params, ["seg_decoder", "Conv_0", "bias"],
            np.asarray(state_dict["seg_out_conv.bias"]),
        )
    return params, stats


def convert_milnet(
    state_dict: Mapping[str, "object"],
    stage_sizes: tuple[int, ...],
    bottleneck: bool,
) -> tuple[dict, dict]:
    """Full reference-MILNet state dict -> (params, batch_stats) covering
    encoder + all four heads."""
    enc_p, enc_s = convert_resnet_encoder(state_dict, stage_sizes, bottleneck)
    head_p, head_s = convert_milnet_heads(state_dict)
    return {"encoder": enc_p, **head_p}, {"encoder": enc_s, **head_s}


_ARCHS = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
    "resnext50_32x4d": ((3, 4, 6, 3), True),
    "resnext101_32x8d": ((3, 4, 23, 3), True),
}

# (groups, width_per_group) — torchvision's Bottleneck width parameters
_GROUPS = {
    "resnet18": (1, 64),
    "resnet34": (1, 64),
    "resnet50": (1, 64),
    "resnext50_32x4d": (32, 4),
    "resnext101_32x8d": (32, 8),
}


def torchvision_key_schema(arch: str) -> dict:
    """Expected torchvision state-dict schema for ``arch``: key -> shape.

    Derived from torchvision's ResNet/ResNeXt constructor arithmetic (the
    reference loads these checkpoints at model/resnet.py:336-361 /
    model/resnext.py:418-442). ``num_batches_tracked`` keys are accepted
    but not listed (value-free); ``fc.*`` is the ImageNet classifier the
    conversion drops.
    """
    stage_sizes, bottleneck = _ARCHS[arch]
    groups, base_width = _GROUPS[arch]
    exp = 4 if bottleneck else 1
    schema: dict = {"conv1.weight": (64, 3, 7, 7)}

    def bn(prefix: str, c: int) -> None:
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            schema[f"{prefix}.{suffix}"] = (c,)

    bn("bn1", 64)
    inplanes = 64
    for stage, blocks in enumerate(stage_sizes, start=1):
        planes = 64 * 2 ** (stage - 1)
        width = int(planes * base_width / 64) * groups
        for b in range(blocks):
            p = f"layer{stage}.{b}"
            if bottleneck:
                schema[f"{p}.conv1.weight"] = (width, inplanes, 1, 1)
                bn(f"{p}.bn1", width)
                schema[f"{p}.conv2.weight"] = (width, width // groups, 3, 3)
                bn(f"{p}.bn2", width)
                schema[f"{p}.conv3.weight"] = (planes * exp, width, 1, 1)
                bn(f"{p}.bn3", planes * exp)
            else:
                schema[f"{p}.conv1.weight"] = (planes, inplanes, 3, 3)
                bn(f"{p}.bn1", planes)
                schema[f"{p}.conv2.weight"] = (planes, planes, 3, 3)
                bn(f"{p}.bn2", planes)
            if b == 0 and (stage > 1 or inplanes != planes * exp):
                schema[f"{p}.downsample.0.weight"] = (
                    planes * exp, inplanes, 1, 1
                )
                bn(f"{p}.downsample.1", planes * exp)
            inplanes = planes * exp
    schema["fc.weight"] = (1000, 512 * exp)
    schema["fc.bias"] = (1000,)
    return schema


def validate_torchvision_state_dict(arch: str, sd: Mapping) -> list[str]:
    """Schema check before conversion: returns a list of human-readable
    problems (missing keys, unexpected keys, wrong shapes); empty = clean.
    A wrong-arch file fails loudly here instead of with an opaque KeyError
    mid-conversion."""
    schema = torchvision_key_schema(arch)
    problems = []
    missing = sorted(k for k in schema if k not in sd)
    extra = sorted(
        k for k in sd
        if k not in schema and not k.endswith("num_batches_tracked")
    )
    if missing:
        problems.append(
            f"{len(missing)} expected key(s) missing for {arch}: "
            + ", ".join(missing[:8]) + ("..." if len(missing) > 8 else "")
        )
    if extra:
        problems.append(
            f"{len(extra)} unexpected key(s): "
            + ", ".join(extra[:8]) + ("..." if len(extra) > 8 else "")
        )
    shape_mismatches = [
        (k, tuple(np.asarray(sd[k]).shape), want)
        for k, want in schema.items()
        if k in sd and tuple(np.asarray(sd[k]).shape) != want
    ]
    if missing or extra or shape_mismatches:
        sd_keys = {k for k in sd if not k.endswith("num_batches_tracked")}
        for other in _ARCHS:
            if other == arch:
                continue
            osch = torchvision_key_schema(other)
            if set(osch) == sd_keys and all(
                tuple(np.asarray(sd[k]).shape) == want
                for k, want in osch.items()
            ):
                problems.append(
                    f"hint: the file matches torchvision {other!r} — "
                    f"wrong --arch?"
                )
                break
    for k, got, want in shape_mismatches:
        problems.append(f"shape mismatch {k}: got {got}, want {want}")
    return problems


def convert_checkpoint(arch: str, torch_path: str, out_path: str) -> str:
    """Produce a pt1-shaped .ckpt whose encoder subtree carries ImageNet
    weights; heads stay freshly initialized at load time (strict=False)."""
    import torch

    from cellsegmentation_tpu.train import checkpoint as ckpt_mod

    stage_sizes, bottleneck = _ARCHS[arch]
    sd = torch.load(torch_path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    enc_params, enc_stats = convert_resnet_encoder(sd, stage_sizes, bottleneck)
    return ckpt_mod.save_checkpoint(
        out_path if out_path.endswith(".ckpt") else out_path,
        "image",
        0,
        arch,
        {"encoder": enc_params, "fc_image_cls": {}, "fc_image_reg": {}},
        {"encoder": enc_stats},
        extra={"source": torch_path, "pretrained": "imagenet"},
    )


if __name__ == "__main__":
    import sys

    if len(sys.argv) != 4:
        raise SystemExit("usage: torch_convert.py <arch> <torch.pth> <out.ckpt>")
    print(convert_checkpoint(sys.argv[1], sys.argv[2], sys.argv[3]))

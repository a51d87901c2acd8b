"""Turnkey torch -> cellsegmentation_tpu checkpoint converter.

Two input kinds, auto-detected:

1. A torchvision ImageNet state dict (what the reference downloads at
   model/resnet.py:336-361 to reach QWK 0.9319 on LYSTO):

       python tools/convert_torchvision.py resnet50 resnet50-19c8e357.pth \
           pretrained/resnet50_imagenet.ckpt

   The key schema (names AND shapes) is validated against the expected
   torchvision layout BEFORE conversion; mismatches are listed explicitly
   (with a wrong---arch hint when the file matches a sibling arch) instead
   of failing with an opaque KeyError mid-conversion. The resulting .ckpt
   carries the encoder subtree; heads initialize fresh on first use, then

       python -m cellsegmentation_tpu.cli.train_image -E resnet50 \
           -r pretrained/resnet50_imagenet.ckpt ...

2. A trained reference checkpoint (the dict the reference's save_model
   writes: {'mode','epoch','state_dict','encoder',...}, reference:
   train_image.py:372-386) — ports a full trained MILNet including every
   head + seg decoder:

       python tools/convert_torchvision.py auto pt2_30epochs.pth out.ckpt

   (arch is read from the file's 'encoder' field; pass it explicitly to
   override.)

Conversion math is oracle-tested in tests/test_torch_parity.py (>=0.99 IoU
gate); the schema validation is tested in tests/test_torch_convert_cli.py.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> None:
    from cellsegmentation_tpu.utils import torch_convert as tc

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("arch", choices=sorted(tc._ARCHS) + ["auto"],
                        help="encoder architecture ('auto' reads it from a "
                             "reference checkpoint's 'encoder' field)")
    parser.add_argument("torch_path", help="input .pth")
    parser.add_argument("out_path", help="output .ckpt")
    args = parser.parse_args(argv)

    import torch

    obj = torch.load(args.torch_path, map_location="cpu", weights_only=True)

    if isinstance(obj, dict) and "state_dict" in obj:
        # reference-trained MILNet checkpoint
        arch = obj.get("encoder") if args.arch == "auto" else args.arch
        if arch not in tc._ARCHS:
            sys.exit(f"unsupported or missing encoder {arch!r} "
                     f"(choices: {sorted(tc._ARCHS)})")
        sd = {k: v.numpy() for k, v in obj["state_dict"].items()
              if hasattr(v, "numpy")}
        stage_sizes, bottleneck = tc._ARCHS[arch]
        params, stats = tc.convert_milnet(sd, stage_sizes, bottleneck)
        from cellsegmentation_tpu.train import checkpoint as ckpt_mod

        mode = obj.get("mode", "image")
        path = ckpt_mod.save_checkpoint(
            args.out_path, mode, int(obj.get("epoch", 0)), arch,
            params, stats,
            extra={"source": args.torch_path, "ported": "reference-milnet"},
        )
        print(f"ported reference {mode!r} checkpoint ({arch}) -> {path}")
        return

    if args.arch == "auto":
        sys.exit("arch 'auto' only applies to reference checkpoints "
                 "(dict with a 'state_dict' key); name the torchvision arch")
    sd = {k: v.numpy() for k, v in obj.items() if hasattr(v, "numpy")}
    problems = tc.validate_torchvision_state_dict(args.arch, sd)
    if problems:
        print(f"{args.torch_path} does not match the torchvision "
              f"{args.arch} schema:", file=sys.stderr)
        for p in problems:
            print(f"  - {p}", file=sys.stderr)
        sys.exit(2)
    path = tc.convert_checkpoint(args.arch, args.torch_path, args.out_path)
    print(f"converted torchvision {args.arch} ImageNet weights -> {path}")


if __name__ == "__main__":
    main()

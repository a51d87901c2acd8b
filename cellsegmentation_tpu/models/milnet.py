"""The 4-head MIL model: one encoder, four task heads, mode-switched apply.

The reference mutates a stateful module (``setmode`` flips the forward path
AND ``requires_grad``; reference: model/resnet.py:250-333). Here the forward
path is a *static* ``mode`` argument — each mode traces to its own XLA
program — and trainability is owned by the optimizer (optax masked updates
over the partitioned param tree; see train/state.py). The param tree's
top-level module names ARE the partition:

    encoder | fc_tile | fc_image_cls | fc_image_reg | seg_decoder

mirroring the reference's key-prefix tuples (reference: model/resnet.py:87-106)
so checkpoint stage-handoff is subtree selection.

BatchNorm semantics per stage (behavior spec):
- stage 1 "image":   everything train-mode, stats update;
- stage 2 "tile":    ``freeze_encoder_stats=True`` reproduces the freeze_bn
  trick — the whole encoder runs on running averages while the tile head
  still trains (reference: model/resnet.py:252-257);
- stage 3 "segment": the reference trains in module.train() mode, so encoder
  stats DO update even though encoder params are frozen
  (reference: train/train.py:172-207 never passes freeze_bn) — replicated by
  calling with train=True and mutable batch_stats.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from cellsegmentation_tpu.core.dtypes import Policy, DEFAULT_POLICY
from cellsegmentation_tpu.models.common import (
    ImageHeadMLP,
    ImageHeadSimple,
    SegDecoder,
    TileHead,
)
from cellsegmentation_tpu.ops.pooling import global_avg_max_pool

MODES = ("image", "tile", "segment")

# Parameter partitions, in reference prefix order (model/resnet.py:87-106).
ENCODER_KEY = "encoder"
TILE_KEY = "fc_tile"
IMAGE_CLS_KEY = "fc_image_cls"
IMAGE_REG_KEY = "fc_image_reg"
SEG_KEY = "seg_decoder"
PARTITIONS = (ENCODER_KEY, TILE_KEY, IMAGE_CLS_KEY, IMAGE_REG_KEY, SEG_KEY)


def pin_constant_count_head(variables: dict, value: float = 5.0) -> None:
    """Pin the image-regression head to a constant: zero its final Dense
    kernel and set the bias to ``value`` (in place).

    Test/bench fixture utility: a random-init head emits large-negative
    pre-relu activations on real images, so counts round to 0 and the
    stage-3 artifact-clearing gate (counts != 0) drops every tile, making
    drawing-path fixtures vacuous.
    """
    reg = variables["params"][IMAGE_REG_KEY]
    last = sorted(k for k in reg if k.startswith("Dense"))[-1]
    reg[last]["kernel"] = reg[last]["kernel"] * 0.0
    reg[last]["bias"] = reg[last]["bias"] * 0.0 + value


class MILNet(nn.Module):
    """Encoder + {tile, image-cls, image-reg, seg} heads.

    ``encoder`` is an unbound nn.Module emitting (x4, x3, x2, x1); its field
    name puts its params under the 'encoder' subtree.
    """

    encoder: nn.Module
    decoder_expansion: int = 1
    image_head_style: str = "mlp"  # "mlp" (resnet/resnext) | "simple" (efficientnet)
    supports_segment: bool = True
    num_tile_classes: int = 2
    num_image_classes: int = 7
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        self.fc_tile = TileHead(self.num_tile_classes, policy=self.policy)
        if self.image_head_style == "mlp":
            self.fc_image_cls = ImageHeadMLP(self.num_image_classes, policy=self.policy)
            self.fc_image_reg = ImageHeadMLP(1, relu_out=True, policy=self.policy)
        else:
            self.fc_image_cls = ImageHeadSimple(
                self.num_image_classes, policy=self.policy
            )
            self.fc_image_reg = ImageHeadSimple(1, relu_out=True, policy=self.policy)
        if self.supports_segment:
            self.seg_decoder = SegDecoder(
                expansion=self.decoder_expansion, policy=self.policy
            )

    def __call__(
        self,
        x: jnp.ndarray,
        mode: str = "image",
        train: bool = False,
        freeze_encoder_stats: bool = False,
    ):
        """Forward. x: [N, H, W, 3] images or tiles (NHWC, normalized).

        mode="image"   -> (cls_logits [N,7], reg [N,1])
        mode="tile"    -> tile logits [N,2]
        mode="segment" -> seg logits [N,H,W,2]
        """
        if mode not in MODES:
            raise ValueError(f"invalid mode {mode!r}; expected one of {MODES}")

        encoder_train = train and not freeze_encoder_stats
        x4, x3, x2, x1 = self.encoder(x, train=encoder_train)

        if mode == "tile":
            return self.fc_tile(x4)

        if mode == "image":
            pooled = global_avg_max_pool(x4)
            out_cls = self.fc_image_cls(pooled, train=train)
            out_reg = self.fc_image_reg(pooled, train=train)
            return out_cls, out_reg

        if not self.supports_segment:
            # reference parity: EfficientNet variants support stages 1-2 only
            # (their seg path is dead code; reference: model/efficientnet.py:334-336)
            raise NotImplementedError(
                f"{self.encoder.__class__.__name__} has no segmentation decoder"
            )
        return self.seg_decoder(
            (x4, x3, x2, x1), out_hw=(x.shape[-3], x.shape[-2]), train=train
        )


def init_variables(model: MILNet, rng, init_hw: tuple[int, int] = (32, 32)) -> dict:
    """Initialize the FULL 4-head variable tree in one pass (jitted).

    Runs every mode's forward once on a tiny dummy (param shapes are
    input-size independent — all convs/denses key off channel dims), matching
    the reference where every head exists from __init__ regardless of stage.
    Returns {'params': ..., 'batch_stats': ...}.
    """

    def init_all(mdl: MILNet) -> None:
        dummy = jnp.zeros((1, *init_hw, 3), mdl.policy.compute_dtype)
        mdl(dummy, mode="image", train=False)
        mdl(dummy, mode="tile", train=False)
        if mdl.supports_segment:
            mdl(dummy, mode="segment", train=False)

    k1, k2 = jax.random.split(rng)
    init_fn = jax.jit(lambda rngs: model.init(rngs, method=init_all))
    return init_fn({"params": k1, "dropout": k2})

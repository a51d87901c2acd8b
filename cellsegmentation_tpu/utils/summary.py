"""Model summary: parameter counts per partition (dev tool).

Replaces the reference's torchsummary dump (reference:
utils/summary_param.py:14-29) with a pure param-tree walk.

    python -m cellsegmentation_tpu.utils.summary resnet50
"""

from __future__ import annotations

import jax
import numpy as np


def count_params(tree) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def summary(model_name: str = "resnet50") -> dict[str, int]:
    from cellsegmentation_tpu.models import build_model

    model = build_model(model_name)

    def init_all(mdl):
        import jax.numpy as jnp

        dummy = jnp.zeros((1, 32, 32, 3), mdl.policy.compute_dtype)
        mdl(dummy, mode="image", train=False)
        mdl(dummy, mode="tile", train=False)
        if mdl.supports_segment:
            mdl(dummy, mode="segment", train=False)

    variables = jax.eval_shape(
        lambda k: model.init({"params": k, "dropout": k}, method=init_all),
        jax.random.PRNGKey(0),
    )
    counts = {k: count_params(v) for k, v in variables["params"].items()}
    counts["TOTAL"] = sum(counts.values())
    return counts


if __name__ == "__main__":
    import sys

    name = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    for part, n in summary(name).items():
        print(f"{part:>16}: {n:>12,}")

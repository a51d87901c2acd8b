"""cellsegmentation_tpu — a TPU-native framework for weakly-supervised IHC cell segmentation.

A from-scratch JAX/Flax/Pallas re-design of the three-stage MIL pipeline of
"A Novel Weakly Supervised Immunohistochemical Cell Segmentation method via Counting
Labels" (reference: Newiz430/CellSegmentation):

- stage 1 ("image"):   image-wise count regression + 7-class counting classification
- stage 2 ("tile"):    MIL instance classifier with adaptive count-driven top-k selection
- stage 3 ("segment"): encoder-decoder segmentation trained on HSV-refined pseudo-masks

Design notes (TPU-first, not a port):
- all compute paths are pure functions under jit/pjit; NHWC layout, bf16 matmuls;
- the tile axis (an image explodes into a dense static grid of tiles) is the
  shardable "sequence": tiles are extracted on-device by gathers and sharded over
  the device mesh, never materialized on host;
- per-stage head freezing is expressed as optax masked updates over a partitioned
  parameter tree instead of requires_grad mutation;
- BatchNorm freezing (the reference's ``freeze_bn`` trick) is explicit control of
  the ``batch_stats`` collection;
- post-processing morphology runs in a native C++ extension (ctypes) with a
  pure-NumPy/SciPy fallback.
"""

__version__ = "0.1.0"

from cellsegmentation_tpu.core import config as config  # noqa: F401

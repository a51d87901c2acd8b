from cellsegmentation_tpu.core.dtypes import Policy, DEFAULT_POLICY, F32_POLICY
from cellsegmentation_tpu.core.config import load_data_path

__all__ = ["Policy", "DEFAULT_POLICY", "F32_POLICY", "load_data_path"]

from cellsegmentation_tpu.utils.logging import RunLogger, sort_files

__all__ = ["RunLogger", "sort_files"]

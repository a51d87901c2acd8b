"""Observability: CSV + TensorBoard + stdout, the reference's three channels.

The reference writes timestamped CSVs (``<ts>-image-training.csv`` etc.),
TensorBoard scalars, and prints per epoch (reference: train_image.py:86,
100-104, 263-271, 389-401). RunLogger bundles all three; TensorBoard is
optional (torch's SummaryWriter, gated import).
"""

from __future__ import annotations

import csv
import os
import re
import time
from typing import Optional, Sequence


def sort_files(files: Sequence[str]) -> list[str]:
    """Natural sort by the first integer in each name
    (reference: utils/utils.py:5-11)."""

    def key(name: str):
        m = re.search(r"\d+", os.path.basename(name))
        return int(m.group()) if m else -1

    return sorted(files, key=key)


class RunLogger:
    """Per-run logging: one CSV per named stream + optional TB + stdout."""

    def __init__(self, output_dir: str, run_name: Optional[str] = None, tensorboard: bool = True):
        os.makedirs(output_dir, exist_ok=True)
        self.output_dir = output_dir
        self.run_name = run_name or time.strftime("%Y%m%d-%H%M%S")
        self._csv_files: dict[str, tuple] = {}
        self._tb = None
        # CST_DISABLE_TB=1 turns TensorBoard off globally: torch's event
        # writer thread + this env's protobuf mix can SIGABRT long pytest
        # sessions (tests/conftest.py sets it)
        if os.environ.get("CST_DISABLE_TB"):
            tensorboard = False
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    os.path.join(output_dir, "runs", self.run_name)
                )
            except Exception:
                self._tb = None

    def csv_row(self, stream: str, header: Sequence[str], row: Sequence) -> None:
        if stream not in self._csv_files:
            path = os.path.join(self.output_dir, f"{self.run_name}-{stream}.csv")
            f = open(path, "a", newline="")
            w = csv.writer(f)
            if f.tell() == 0:
                w.writerow(header)
            self._csv_files[stream] = (f, w)
        f, w = self._csv_files[stream]
        w.writerow(row)
        f.flush()

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def scalars(self, values: dict[str, float], step: int) -> None:
        for tag, v in values.items():
            self.scalar(tag, v, step)

    def info(self, msg: str) -> None:
        print(msg, flush=True)

    def close(self) -> None:
        for f, _ in self._csv_files.values():
            f.close()
        if self._tb is not None:
            self._tb.close()

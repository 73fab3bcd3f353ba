"""Running meters for loss/throughput logging (reference
``imdb-wiki-dir/utils.py:10-48``), plus a per-step throughput tracker —
images/sec/chip is the framework's north-star performance metric."""

from __future__ import annotations

import logging
import time


class AverageMeter:
    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)


class ProgressMeter:
    def __init__(self, num_batches: int, meters, prefix: str = ""):
        num_digits = len(str(num_batches))
        self.batch_fmtstr = "[{:" + str(num_digits) + "d}/" + f"{num_batches}]"
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(meter) for meter in self.meters]
        logging.info("\t".join(entries))


class Throughput:
    """Samples/sec/chip tracker; call start() after warmup, update(n) per step."""

    def __init__(self, num_chips: int = 1):
        self.num_chips = num_chips
        self.reset()

    def reset(self):
        self._t0 = None
        self._samples = 0

    def start(self):
        self._t0 = time.perf_counter()
        self._samples = 0

    def update(self, n: int):
        if self._t0 is not None:
            self._samples += n

    @property
    def per_chip(self) -> float:
        if self._t0 is None or self._samples == 0:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._samples / dt / self.num_chips

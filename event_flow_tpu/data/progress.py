"""Console progress with a live Hz readout (reference: dataloader/utils.py
ProgressBar suffix — forward passes per second)."""

import sys
import time

__all__ = ["ProgressPrinter"]


class ProgressPrinter:
    def __init__(self, enabled=True, every=25):
        self.enabled = enabled
        self.every = every
        self._n = 0
        self._t0 = time.perf_counter()
        self._label = ""

    def set_label(self, label):
        if label != self._label:
            self._label = label

    def tick(self, label=None):
        if not self.enabled:
            return
        if label is not None:
            self.set_label(label)
        self._n += 1
        if self._n % self.every == 0:
            hz = self._n / max(time.perf_counter() - self._t0, 1e-9)
            sys.stdout.write(
                f"\r{self._label}  {self._n} windows  {hz:7.1f} Hz  "
            )
            sys.stdout.flush()

    def finish(self):
        if self.enabled and self._n:
            sys.stdout.write("\n")

"""Stub of the ``progress`` package's Bar (display-only; the reference
dataloader instantiates one per open file, dataloader/h5.py)."""


class Bar:
    avg = 1.0

    def __init__(self, *a, **k):
        pass

    def next(self):
        pass

    def finish(self):
        pass

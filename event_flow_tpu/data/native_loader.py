"""Native (C++) prefetching event loader: pack converter + ctypes wrapper.

The training hot path reads fixed-count event windows; the reference does
this single-threaded inside the torch Dataset (dataloader/h5.py, with
num_workers=0 — parser.py:86), so window assembly serializes with the
training step. The native loader (native/evloader.cpp) mmaps flat event
packs and assembles the next [B, N, 4] batch on a producer thread while
the device computes; `.h5` sequences are converted once with
``convert_h5_dir``.

Falls back cleanly: if the shared library can't be built, callers should
use the Python EventStream (data/h5.py).
"""

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["build_library", "convert_h5", "convert_h5_dir",
           "NativeEventStream", "native_available"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libevloader.so")
_MAGIC = b"EVPK1\0\0\0"


def build_library(force=False):
    """Compile native/evloader.cpp -> libevloader.so (g++, lazily)."""
    src = os.path.join(_NATIVE_DIR, "evloader.cpp")
    if os.path.exists(_LIB_PATH) and not force:
        if os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
            return _LIB_PATH
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _LIB_PATH,
         src, "-lpthread"],
        check=True,
    )
    return _LIB_PATH


def native_available():
    try:
        build_library()
        return True
    except Exception:
        return False


def _load_lib():
    lib = ctypes.CDLL(build_library())
    lib.evl_open.restype = ctypes.c_void_p
    lib.evl_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                             ctypes.c_int, ctypes.c_int]
    lib.evl_next.restype = ctypes.c_uint64
    lib.evl_next.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_int32),
                             ctypes.POINTER(ctypes.c_int64)]
    lib.evl_close.argtypes = [ctypes.c_void_p]
    return lib


def convert_h5(h5_path, pack_path=None):
    """Convert one reference-schema .h5 sequence to an .evpack file."""
    import h5py

    pack_path = pack_path or os.path.splitext(h5_path)[0] + ".evpack"
    with h5py.File(h5_path, "r") as f:
        ts = np.asarray(f["events/ts"], np.float64)
        ys = np.asarray(f["events/ys"], np.uint16)
        xs = np.asarray(f["events/xs"], np.uint16)
        ps = np.asarray(f["events/ps"], np.uint8)
    with open(pack_path, "wb") as out:
        out.write(_MAGIC)
        out.write(np.uint64(len(ts)).tobytes())
        out.write(ts.tobytes())
        out.write(ys.tobytes())
        out.write(xs.tobytes())
        out.write(ps.tobytes())
    return pack_path


def convert_h5_dir(path):
    """Convert every .h5 under ``path``; returns the pack list."""
    from .h5 import find_h5_files

    return [convert_h5(p) for p in find_h5_files(path)]


class NativeEventStream:
    """EventStream-compatible reader for the training hot path (events
    mode) with native background prefetch. Augmentation flags are drawn on
    the Python side using the per-slot rollover mask the loader reports."""

    def __init__(self, config, packs=None, rng=None):
        assert config["data"]["mode"] == "events", (
            "native loader covers the fixed-window training path; use "
            "EventStream for other modes"
        )
        from .augment import draw_augment_flags

        self.config = config
        self.batch_size = config["loader"]["batch_size"]
        self.window = int(config["data"]["window"])
        self.rng = rng or np.random.default_rng(
            config["loader"].get("seed", 0))
        if packs is None:
            packs = convert_h5_dir(config["data"]["path"])
        assert packs, "no event packs"
        self.files = list(packs)
        self._mechanisms = config["loader"].get("augment", [])
        self._probs = config["loader"].get("augment_prob", [])
        self.aug_flags = draw_augment_flags(
            self.rng, self.batch_size, self._mechanisms, self._probs)

        self._lib = _load_lib()
        arr = (ctypes.c_char_p * len(packs))(
            *[p.encode() for p in packs])
        self._h = self._lib.evl_open(arr, len(packs), self.batch_size,
                                     self.window)
        if not self._h:
            raise RuntimeError("evl_open failed")
        self._events = np.empty(
            (self.batch_size, self.window, 4), np.float32)
        self._dt = np.empty(self.batch_size, np.float32)
        self._file_of_slot = np.empty(self.batch_size, np.int32)
        self._seq = np.zeros(1, np.int64)
        self.seq_num = 0
        self.samples = 0
        self.new_seq = False

    def slot_filename(self, slot):
        return os.path.basename(self.files[int(self._file_of_slot[slot])])

    def next_batch(self):
        from .augment import draw_augment_flags

        rolled = self._lib.evl_next(
            self._h,
            self._events.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._dt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._file_of_slot.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)),
            self._seq.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        self.seq_num = int(self._seq[0])
        new_seq = rolled != 0
        for s in range(self.batch_size):
            if rolled & (1 << s):
                self.aug_flags[s] = draw_augment_flags(
                    self.rng, 1, self._mechanisms, self._probs)[0]
        self.new_seq = new_seq
        return {
            "events": self._events.copy(),
            "valid": np.ones((self.batch_size, self.window), np.float32),
            "aug_flags": self.aug_flags.copy(),
            "dt_input": self._dt.copy(),
            "new_seq": new_seq,
        }

    def close(self):
        if self._h:
            self._lib.evl_close(self._h)
            self._h = None

"""Native (C++) prefetching event loader: pack converter + ctypes wrapper.

The training/eval hot path reads event windows; the reference does this
single-threaded inside the torch Dataset (dataloader/h5.py, with
num_workers=0 — parser.py:86), so window assembly serializes with the
training step. The native loader (native/evloader.cpp) mmaps flat event
packs and assembles the next [B, N, 4] batch on a producer thread while
the device computes; `.h5` sequences are converted once with
``convert_h5_dir``.

Supported window modes (same semantics as data/h5.py::EventStream):
  - ``events``: fixed-count windows (the training fast path)
  - ``time``: fixed-seconds windows (binary search inside the C++ loader)
  - ``gtflow_dt1`` / ``gtflow_dt4``: cursor over gt flow-map timestamps
    with fractional windows — the AEE-eval fast path. The C++ side does
    the event windowing; the (small) gt flow maps are read from the
    original .h5 on demand.

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
_MAGIC = b"EVPK2\0\0\0"

_MODE_IDS = {"events": 0, "time": 1, "gtflow_dt1": 2, "gtflow_dt4": 2}


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
                             ctypes.c_int, ctypes.c_int, ctypes.c_double,
                             ctypes.c_int]
    lib.evl_next.restype = ctypes.c_uint64
    lib.evl_next.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_int32),
                             ctypes.POINTER(ctypes.c_int32),
                             ctypes.POINTER(ctypes.c_int64),
                             ctypes.POINTER(ctypes.c_int32)]
    lib.evl_close.argtypes = [ctypes.c_void_p]
    return lib


def _map_timestamps(f, group_name):
    """Timestamps of a flow/image group in insertion order (matches
    _TimestampedGroup in data/h5.py)."""
    names, ts = [], []

    def visit(name, obj):
        if hasattr(obj, "dtype") and name not in names:
            names.append(name)
            ts.append(float(obj.attrs["timestamp"]))

    f[group_name].visititems(visit)
    return names, np.asarray(ts, np.float64)


def convert_h5(h5_path, pack_path=None, map_group=None):
    """Convert one reference-schema .h5 sequence to an .evpack file.

    ``map_group`` ("flow_dt1"/"flow_dt4"/"images") bakes that group's
    timestamps into the pack for gtflow/frames windowing."""
    import h5py

    pack_path = pack_path or os.path.splitext(h5_path)[0] + ".evpack"
    with h5py.File(h5_path, "r") as f:
        ts = np.asarray(f["events/ts"], np.float64)
        ys = np.asarray(f["events/ys"], np.uint16)
        xs = np.asarray(f["events/xs"], np.uint16)
        ps = np.asarray(f["events/ps"], np.uint8)
        t0 = float(f.attrs["t0"])
        map_ts = np.empty(0, np.float64)
        if map_group is not None and map_group in f:
            _, map_ts = _map_timestamps(f, map_group)
    last_ts_rel = float(ts[-1] - t0) if len(ts) else 0.0
    with open(pack_path, "wb") as out:
        out.write(_MAGIC)
        out.write(np.uint64(len(ts)).tobytes())
        out.write(np.float64(t0).tobytes())
        out.write(np.float64(last_ts_rel).tobytes())
        out.write(np.uint64(len(map_ts)).tobytes())
        out.write(map_ts.tobytes())
        out.write(ts.tobytes())
        out.write(ys.tobytes())
        out.write(xs.tobytes())
        out.write(ps.tobytes())
    return pack_path


def convert_h5_dir(path, map_group=None):
    """Convert every .h5 under ``path``; returns the pack list."""
    from .h5 import find_h5_files

    return [convert_h5(p, map_group=map_group) for p in find_h5_files(path)]


class NativeEventStream:
    """EventStream-compatible reader with native background prefetch.

    Modes: events (fixed windows), time (seconds), gtflow_dt1/dt4 (gt-map
    cursor with fractional windows). Augmentation flags are drawn on the
    Python side using the per-slot rollover mask the loader reports; in
    gtflow modes the gt maps themselves are read lazily from the source
    .h5 files (small [2,H,W] arrays — the event windowing is the heavy
    part and stays native)."""

    def __init__(self, config, packs=None, rng=None):
        from .augment import draw_augment_flags

        self.config = config
        self.mode = config["data"]["mode"]
        assert self.mode in _MODE_IDS, (
            f"native loader does not cover mode {self.mode!r}; use "
            "EventStream"
        )
        self.batch_size = config["loader"]["batch_size"]
        self.window = float(config["data"]["window"])
        self.rng = rng or np.random.default_rng(
            config["loader"].get("seed", 0))
        self._map_group = (
            self.mode.replace("gtflow_", "flow_")
            if self.mode.startswith("gtflow") else None
        )
        if packs is None:
            packs = convert_h5_dir(config["data"]["path"],
                                   map_group=self._map_group)
        assert packs, "no event packs"
        self.files = list(packs)
        if self.mode == "events":
            self.n_max = int(self.window)
        else:
            self.n_max = int(config["data"].get("max_events", 65536))
        self._mechanisms = config["loader"].get("augment", [])
        self._probs = config["loader"].get("augment_prob", [])
        self.aug_flags = draw_augment_flags(
            self.rng, self.batch_size, self._mechanisms, self._probs)

        self._lib = _load_lib()
        arr = (ctypes.c_char_p * len(packs))(
            *[p.encode() for p in packs])
        self._h = self._lib.evl_open(arr, len(packs), self.batch_size,
                                     _MODE_IDS[self.mode], self.window,
                                     self.n_max)
        if not self._h:
            raise RuntimeError("evl_open failed")
        self._events = np.empty(
            (self.batch_size, self.n_max, 4), np.float32)
        self._valid = np.empty((self.batch_size, self.n_max), np.float32)
        self._dt = np.empty(self.batch_size, np.float32)
        self._gt_idx = np.empty(self.batch_size, np.int32)
        self._file_of_slot = np.empty(self.batch_size, np.int32)
        self._seq = np.zeros(1, np.int64)
        self._overflow = np.zeros(1, np.int32)
        self.seq_num = 0
        self.samples = 0
        self.new_seq = False
        self.last_proc_timestamp = 0.0
        self._h5_cache = {}  # file index -> (h5py.File, names, ts)

    def slot_filename(self, slot):
        return os.path.basename(self.files[int(self._file_of_slot[slot])])

    def _gt_maps(self, fidx):
        """Open (cached) the source .h5 of pack ``fidx`` for gt-map reads."""
        if fidx not in self._h5_cache:
            import h5py

            h5_path = os.path.splitext(self.files[fidx])[0] + ".h5"
            f = h5py.File(h5_path, "r")
            names, ts = _map_timestamps(f, self._map_group)
            self._h5_cache[fidx] = (f, names, ts)
        return self._h5_cache[fidx]

    def next_batch(self):
        from .augment import augment_flowmap_np, draw_augment_flags

        p_f32 = ctypes.POINTER(ctypes.c_float)
        p_i32 = ctypes.POINTER(ctypes.c_int32)
        rolled = self._lib.evl_next(
            self._h,
            self._events.ctypes.data_as(p_f32),
            self._valid.ctypes.data_as(p_f32),
            self._dt.ctypes.data_as(p_f32),
            self._gt_idx.ctypes.data_as(p_i32),
            self._file_of_slot.ctypes.data_as(p_i32),
            self._seq.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self._overflow.ctypes.data_as(p_i32),
        )
        if self._overflow[0]:
            raise ValueError(
                f"window with {int(self._overflow[0])} events exceeds "
                f"data.max_events={self.n_max}; raise it in the config"
            )
        self.seq_num = int(self._seq[0])
        new_seq = rolled != 0
        for s in range(self.batch_size):
            if rolled & (1 << s):
                self.aug_flags[s] = draw_augment_flags(
                    self.rng, 1, self._mechanisms, self._probs)[0]
        self.new_seq = new_seq
        n_live = self._valid.sum(axis=1).astype(int)
        if n_live.max() > 0:
            s = int(np.argmax(n_live))
            self.last_proc_timestamp = float(
                self._events[s, n_live[s] - 1, 0])
        batch = {
            "events": self._events.copy(),
            "valid": self._valid.copy(),
            "aug_flags": self.aug_flags.copy(),
            "dt_input": self._dt.copy(),
            "new_seq": new_seq,
        }
        if self._map_group is not None:
            gt = np.zeros((self.batch_size, *self._gt_shape()), np.float32)
            dt_gt = np.zeros(self.batch_size, np.float32)
            for s in range(self.batch_size):
                idx = int(self._gt_idx[s])
                if idx < 0:
                    continue
                f, names, ts = self._gt_maps(int(self._file_of_slot[s]))
                fm = np.asarray(f[self._map_group][names[idx]], np.float32)
                fm = augment_flowmap_np(fm, self.aug_flags[s])
                gt[s] = np.moveaxis(fm, 0, -1)  # NHWC (x, y)
                if idx > 0:
                    dt_gt[s] = np.float32(ts[idx] - ts[idx - 1])
            batch["gtflow"] = gt
            batch["dt_gt"] = dt_gt
        return batch

    def _gt_shape(self):
        res = tuple(self.config["loader"]["resolution"])
        return (*res, 2)

    def close(self):
        if self._h:
            self._lib.evl_close(self._h)
            self._h = None
        for f, _, _ in self._h5_cache.values():
            f.close()
        self._h5_cache = {}

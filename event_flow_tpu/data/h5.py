"""Streaming HDF5 event pipeline with explicit, functional stream state.

TPU-native rebuild of the reference's stateful Dataset
(reference: dataloader/h5.py, dataloader/base.py). Differences by design
(SURVEY.md §3.5, §7):

  - the stream is an explicit object the training loop owns — no mutable
    torch Dataset shared with a DataLoader; no ``__len__()=1000`` fiction
  - windows ship to the device as RAW event lists [B, N, 4] + validity
    masks; all tensor encodings (count/voxel/mask images, augmentation
    flips, hot-pixel filtering) happen on-device inside the jitted step
  - per-file timestamp arrays are loaded once and searched with
    ``np.searchsorted`` (replaces the recursive Python binary search on the
    h5 dataset, dataloader/encodings.py:9-27)
  - fixed event-count windows give static shapes; variable-length modes
    (time / frames / gtflow) pad to ``data.max_events`` with a mask

HDF5 schema (inferred from the reference, h5.py:66-87, 127-134, 303, 314):
  events/{xs, ys, ts, ps}; file attrs ``t0``, ``duration``; optional groups
  ``images/`` and ``flow_dt1/`` / ``flow_dt4/`` whose datasets carry a
  ``timestamp`` attr.

Window modes (reference: h5.py:136-173): ``events`` (fixed count),
``time`` (seconds), ``frames``, ``gtflow_dt1``, ``gtflow_dt4`` (cursor over
GT maps, optionally fractional windows, h5.py:208-223).
"""

import os

import h5py
import numpy as np

from .augment import augment_flowmap_np, augment_frames_np, draw_augment_flags

__all__ = ["H5SequenceFile", "EventStream", "find_h5_files"]


def find_h5_files(path):
    """Recursively list .h5 files (reference: h5.py:57-61)."""
    out = []
    for root, _, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".h5"):
                out.append(os.path.join(root, f))
    return sorted(out)


class _TimestampedGroup:
    """Names + timestamps of a group's datasets, sorted by insertion order
    (reference Frames/FlowMaps visitors, h5.py:15-42)."""

    def __init__(self, group):
        self.names = []
        self.ts = []

        def visit(name, obj):
            if hasattr(obj, "dtype") and name not in self.names:
                self.names.append(name)
                self.ts.append(obj.attrs["timestamp"])

        group.visititems(visit)


class H5SequenceFile:
    """One open HDF5 sequence.

    Timestamp search is memory-bounded: small files load ``events/ts``
    once; large files (> ``TS_EAGER_MAX`` events) keep only a ~4k-point
    sampled index in RAM and bisect on disk inside the bracketing stride
    (the reference bisects the on-disk dataset recursively,
    dataloader/encodings.py:9-27 — same I/O bound, two reads per query).
    Real MVSEC/ECD sequences have 1e8+ events; eager float64 loading per
    batch slot would cost GBs.
    """

    TS_EAGER_MAX = 1 << 22  # ~32 MB of float64 per slot at most
    TS_SAMPLE_TARGET = 4096

    def __init__(self, path, mode="events"):
        self.path = path
        self.file = h5py.File(path, "r")
        self.t0 = self.file.attrs["t0"]
        self.duration = self.file.attrs.get("duration")
        ds = self.file["events/ts"]
        self.num_events = int(ds.shape[0])
        if self.num_events <= self.TS_EAGER_MAX:
            self.ts_all = np.asarray(ds)
            self._ts_stride = 0
            self._ts_samples = None
        else:
            self.ts_all = None
            self._ts_stride = int(
                np.ceil(self.num_events / self.TS_SAMPLE_TARGET)
            )
            self._ts_samples = np.asarray(ds[:: self._ts_stride])
        self.last_ts = (
            float(ds[-1]) - self.t0 if self.num_events else 0.0
        )
        self.frames = None
        self.flowmaps = None
        if mode == "frames":
            self.frames = _TimestampedGroup(self.file["images"])
        elif mode in ("gtflow_dt1", "gtflow_dt4"):
            self.flowmaps = _TimestampedGroup(self.file[mode.replace("gtflow_", "flow_")])

    def find_ts_index(self, timestamp):
        if self.ts_all is not None:
            return int(np.searchsorted(self.ts_all, timestamp, side="left"))
        j = int(np.searchsorted(self._ts_samples, timestamp, side="left"))
        lo = max(0, (j - 1) * self._ts_stride)
        hi = min(self.num_events, j * self._ts_stride + 1)
        chunk = np.asarray(self.file["events/ts"][lo:hi])
        return lo + int(np.searchsorted(chunk, timestamp, side="left"))

    def _ts_slice(self, idx0, idx1):
        if self.ts_all is not None:
            return self.ts_all[idx0:idx1]
        return np.asarray(self.file["events/ts"][idx0:idx1])

    def get_events(self, idx0, idx1):
        """Slice events; returns (xs, ys, ts, ps) with ts shifted to t0=0
        and ps in {-1, +1} (reference: h5.py:115-134, base.py:80-86)."""
        e = self.file
        xs = np.asarray(e["events/xs"][idx0:idx1], np.float32)
        ys = np.asarray(e["events/ys"][idx0:idx1], np.float32)
        ts = (self._ts_slice(idx0, idx1) - self.t0).astype(np.float32)
        ps = np.asarray(e["events/ps"][idx0:idx1], np.float32) * 2.0 - 1.0
        return xs, ys, ts, ps

    def read_frame(self, name):
        return np.asarray(self.file["images"][name])

    def read_flowmap(self, name, mode):
        return np.asarray(self.file[mode.replace("gtflow_", "flow_")][name])

    def close(self):
        self.file.close()


class EventStream:
    """Multi-slot streaming reader producing fixed-shape batches.

    Per-slot sequence cursors with rollover to the next file
    (reference: h5.py:51-68, :242-270); per-slot augmentation flags redrawn
    at sequence changes (base.py:49-64); global ``new_seq`` flag consumed by
    the training loop (train_flow.py:100-105).
    """

    def __init__(self, config, rng=None):
        self.config = config
        self.mode = config["data"]["mode"]
        self.window = config["data"]["window"]
        self.batch_size = config["loader"]["batch_size"]
        self.res = tuple(config["loader"]["resolution"])
        self.rng = rng or np.random.default_rng(config["loader"].get("seed", 0))
        self.files = find_h5_files(config["data"]["path"])
        if not self.files:
            raise FileNotFoundError(
                f"no .h5 files under {config['data']['path']!r}"
            )
        shard = config["loader"].get("process_shard")
        if shard:
            # multi-process data parallelism: each process streams a
            # disjoint round-robin file subset (parallel/distributed.py)
            pid, pcount = int(shard[0]), int(shard[1])
            from ..parallel.distributed import process_file_shard

            self.files = process_file_shard(self.files, pid, pcount)
        mechanisms = config["loader"].get("augment", [])
        probs = config["loader"].get("augment_prob", [])
        self._mechanisms = mechanisms
        self._probs = probs

        if self.mode == "events":
            self.max_events = int(self.window)
        else:
            self.max_events = int(config["data"].get("max_events", 65536))

        # loop-control state (reference keeps these on the Dataset,
        # h5.py:48-54, base.py:16-21)
        self.epoch = 0
        self.seq_num = 0
        self.samples = 0
        self.new_seq = False
        self.last_proc_timestamp = 0.0

        self.batch_idx = list(range(self.batch_size))
        self.batch_row = [0.0 for _ in range(self.batch_size)]
        self.open_files = [
            H5SequenceFile(self.files[i % len(self.files)], self.mode)
            for i in range(self.batch_size)
        ]
        self.aug_flags = draw_augment_flags(
            self.rng, self.batch_size, mechanisms, probs
        )

    # -- bookkeeping ------------------------------------------------------

    def shuffle(self, flag=True):
        """Shuffle the file list and reopen slots (reference: base.py:267-273
        shuffles only the list; we reopen so slots see the new order)."""
        if flag:
            self.rng.shuffle(self.files)
            for i in range(self.batch_size):
                self.open_files[i].close()
                self.open_files[i] = H5SequenceFile(
                    self.files[i % len(self.files)], self.mode
                )
                self.batch_idx[i] = i
                self.batch_row[i] = 0.0

    def slot_filename(self, slot):
        return os.path.basename(
            self.files[self.batch_idx[slot] % len(self.files)]
        )

    def _rollover(self, slot):
        """Advance a slot to the next sequence (reference: h5.py:242-270)."""
        self.new_seq = True
        self.seq_num += 1
        # redraw augmentation for this slot (base.py:60-64)
        new_flags = draw_augment_flags(self.rng, 1, self._mechanisms,
                                       self._probs)
        self.aug_flags[slot] = new_flags[0]
        self.batch_row[slot] = 0.0
        self.batch_idx[slot] = max(self.batch_idx) + 1
        self.open_files[slot].close()
        self.open_files[slot] = H5SequenceFile(
            self.files[self.batch_idx[slot] % len(self.files)], self.mode
        )

    # -- window extraction ------------------------------------------------

    def _event_index_range(self, slot):
        """Event index range of the current window (reference: h5.py:136-173
        + fractional-window interpolation h5.py:208-223)."""
        f = self.open_files[slot]
        row = self.batch_row[slot]
        if self.mode == "events":
            return int(row), int(row) + int(self.window)
        if self.mode == "time":
            i0 = f.find_ts_index(row + f.t0)
            i1 = f.find_ts_index(row + f.t0 + self.window)
            return i0, i1
        group = f.frames if self.mode == "frames" else f.flowmaps
        idx0 = int(np.floor(row))
        idx1 = int(np.ceil(row + self.window))
        if self.window < 1.0 and idx1 - idx0 > 1:
            idx0 += idx1 - idx0 - 1
        i0 = f.find_ts_index(group.ts[idx0])
        i1 = f.find_ts_index(group.ts[idx1])
        if self.window < 1.0:
            floor_row = int(np.floor(row))
            ceil_row = int(np.ceil(row + self.window))
            if ceil_row - floor_row > 1:
                floor_row += ceil_row - floor_row - 1
            d0 = row - floor_row
            d1 = row + self.window - floor_row
            delta = i1 - i0
            i1 = int(i0 + d1 * delta)
            i0 = int(i0 + d0 * delta)
        return i0, i1

    def _needs_restart_pre(self, slot):
        """Frame/gtflow cursor exhaustion (reference: h5.py:187-198)."""
        if self.mode in ("frames", "gtflow_dt1", "gtflow_dt4"):
            f = self.open_files[slot]
            group = f.frames if self.mode == "frames" else f.flowmaps
            return int(
                np.ceil(self.batch_row[slot] + self.window)
            ) >= len(group.ts)
        return False

    def _slot_window(self, slot):
        """Produce one window for a slot, rolling sequences as needed.
        Returns dict of numpy arrays."""
        while True:
            f = self.open_files[slot]
            restart = self._needs_restart_pre(slot)
            xs = ys = ts = ps = np.empty(0, np.float32)
            if not restart:
                i0, i1 = self._event_index_range(slot)
                xs, ys, ts, ps = f.get_events(i0, i1)
                if ts.shape[0] > 0:
                    self.last_proc_timestamp = ts[-1]
            # sequence-end checks (reference: h5.py:227-232)
            if self.mode == "events" and xs.shape[0] < self.window:
                restart = True
            if (
                self.mode == "time"
                and self.batch_row[slot] + self.window >= f.last_ts
            ):
                restart = True
            if restart:
                self._rollover(slot)
                continue
            # <10 events => zero window (reference: h5.py:235-239)
            if xs.shape[0] <= 10:
                xs = ys = ts = ps = np.empty(0, np.float32)

            dt_input = np.float32(ts[-1] - ts[0]) if ts.shape[0] else np.float32(0)

            out = {"dt_input": dt_input, "dt_gt": np.float32(0.0)}

            if self.mode == "frames":
                group = f.frames
                i_cur = int(np.floor(self.batch_row[slot]))
                i_next = int(np.ceil(self.batch_row[slot] + self.window))
                fr = np.zeros((2, *self.res), np.uint8)
                img0 = f.read_frame(group.names[i_cur])
                img1 = f.read_frame(group.names[i_next])
                fr[0] = augment_frames_np(img0, self.aug_flags[slot])
                fr[1] = augment_frames_np(img1, self.aug_flags[slot])
                out["frames"] = fr
            if self.mode in ("gtflow_dt1", "gtflow_dt4"):
                group = f.flowmaps
                idx = int(np.ceil(self.batch_row[slot] + self.window))
                fm = f.read_flowmap(group.names[idx], self.mode)
                fm = augment_flowmap_np(
                    np.asarray(fm, np.float32), self.aug_flags[slot]
                )
                # NHWC (x, y) for the device side
                out["gtflow"] = np.moveaxis(fm, 0, -1)
                if idx > 0:
                    out["dt_gt"] = np.float32(
                        group.ts[idx] - group.ts[idx - 1]
                    )

            # pad to the static bucket
            n = xs.shape[0]
            if n > self.max_events:
                raise ValueError(
                    f"window with {n} events exceeds data.max_events="
                    f"{self.max_events}; raise it in the config"
                )
            ev = np.zeros((self.max_events, 4), np.float32)
            # padded events sit at (-1, -1) so feasibility masking drops them
            ev[:, 1:3] = -1.0
            ev[:n, 0] = ts
            ev[:n, 1] = ys
            ev[:n, 2] = xs
            ev[:n, 3] = ps
            valid = np.zeros(self.max_events, np.float32)
            valid[:n] = 1.0
            out["events"] = ev
            out["valid"] = valid

            self.batch_row[slot] += self.window
            return out

    def next_batch(self):
        """One batch of windows across all slots.

        Returns dict of stacked numpy arrays:
          events [B, N, 4] raw (ts from t0, y, x, p in ±1; un-augmented —
          flips happen on-device with ``aug_flags``), valid [B, N],
          aug_flags [B, 3], plus dt_input/dt_gt [B] and mode extras;
          ``new_seq`` reports (and clears) the global rollover flag.
        """
        self.new_seq = False
        slots = [self._slot_window(b) for b in range(self.batch_size)]
        batch = {
            key: np.stack([s[key] for s in slots])
            for key in slots[0]
        }
        batch["aug_flags"] = self.aug_flags.copy()
        batch["new_seq"] = self.new_seq
        return batch

    def close(self):
        for f in self.open_files:
            f.close()

"""Real-data readiness drill (VERDICT r4 #8): validate a dataset tree.

MVSEC/ECD/HQF/UZH-FPV are absent from this environment, but both this
framework and the unmodified reference consume the same HDF5 schema
(ours: data/h5.py; reference: dataloader/h5.py:66-87,127-134). This tool
validates any dataset directory against that schema — per-file
``events/{xs,ys,ts,ps}``, ``t0``/``duration`` attrs, sortedness and bounds,
optional ``flow_dt1``/``flow_dt4`` groups whose datasets carry ``timestamp``
attrs and [2, H, W] shape — and prints the exact stock commands that
reproduce the paper's Table 1/2 protocol once the real ``.h5`` files land
under ``datasets/data/``.

Usage:
  python tools/check_dataset.py <dir> [--mode events|gtflow_dt1|gtflow_dt4]
      [--res H W] [--strict]

Exit code 0 = every file passes; 1 = at least one problem (each printed
with file + reason). ``--strict`` also fails on warnings (missing optional
``duration``, unsorted flow-map timestamps, events outside --res bounds).
"""

import argparse
import glob
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_file(path, mode="events", res=None):
    """Returns (errors, warnings): lists of strings, empty = pass."""
    errors, warnings = [], []
    try:
        f = h5py.File(path, "r")
    except Exception as e:  # noqa: BLE001 — report unreadable files
        return [f"not a readable HDF5 file: {e}"], []
    with f:
        # --- events group -------------------------------------------------
        for name in ("xs", "ys", "ts", "ps"):
            key = f"events/{name}"
            if key not in f:
                errors.append(f"missing dataset {key}")
        if errors:
            return errors, warnings
        n = {name: f[f"events/{name}"].shape[0]
             for name in ("xs", "ys", "ts", "ps")}
        if len(set(n.values())) != 1:
            errors.append(f"events/* length mismatch: {n}")
        if min(n.values()) == 0:
            errors.append("events/* empty")
            return errors, warnings

        ts = np.asarray(f["events/ts"])
        if not np.all(np.diff(ts) >= 0):
            bad = int(np.argmin(np.diff(ts) >= 0))
            errors.append(f"events/ts not sorted (first violation at "
                          f"index {bad})")

        # --- attrs both readers require ------------------------------------
        if "t0" not in f.attrs:
            errors.append("missing file attr 't0' (reference "
                          "dataloader/h5.py:68,131 subtracts it)")
        else:
            t0 = float(f.attrs["t0"])
            if abs(t0 - float(ts[0])) > 1e-3:
                warnings.append(
                    f"attr t0={t0:.6f} != first event ts {float(ts[0]):.6f}"
                    " (time-mode windows will be offset)")
        if "duration" not in f.attrs:
            # the reference requires it only in time mode
            # (dataloader/h5.py:104); our reader derives it when absent
            warnings.append("missing file attr 'duration' (required by the "
                            "reference's time mode)")

        # --- coordinate dtypes/bounds --------------------------------------
        xs = np.asarray(f["events/xs"][:min(n["xs"], 1_000_000)])
        ys = np.asarray(f["events/ys"][:min(n["ys"], 1_000_000)])
        ps = np.asarray(f["events/ps"][:min(n["ps"], 1_000_000)])
        up = set(np.unique(ps).tolist())
        if not (up <= {0, 1} or up <= {-1, 1}):
            errors.append(f"events/ps values {sorted(up)[:6]} not in "
                          "{0,1} or {-1,1}")
        if xs.min() < 0 or ys.min() < 0:
            errors.append("negative event coordinates")
        if res is not None:
            h, w = res
            if xs.max() >= w or ys.max() >= h:
                warnings.append(
                    f"events outside --res {h}x{w}: max x={xs.max():.0f}, "
                    f"y={ys.max():.0f} (check loader.resolution)")

        # --- GT flow groups -------------------------------------------------
        for grp in ("flow_dt1", "flow_dt4"):
            required = mode == f"gtflow_{grp.split('_')[1]}"
            if grp not in f:
                if required:
                    errors.append(
                        f"mode {mode} requires group '{grp}' "
                        "(reference dataloader/h5.py:80-86)")
                continue
            names, stamps, shapes = [], [], []

            def visit(name, obj, _n=names, _s=stamps, _sh=shapes):
                if isinstance(obj, h5py.Dataset):
                    _n.append(name)
                    _s.append(obj.attrs.get("timestamp"))
                    _sh.append(obj.shape)

            f[grp].visititems(visit)
            if not names:
                (errors if required else warnings).append(
                    f"group '{grp}' has no datasets")
                continue
            missing = [nm for nm, st in zip(names, stamps) if st is None]
            if missing:
                errors.append(
                    f"{grp}: {len(missing)} dataset(s) missing the "
                    f"'timestamp' attr (e.g. {missing[0]}) — both readers "
                    "key windows on it")
            bad_shape = [(nm, sh) for nm, sh in zip(names, shapes)
                         if len(sh) != 3 or sh[0] != 2]
            if bad_shape:
                errors.append(
                    f"{grp}: dataset {bad_shape[0][0]} has shape "
                    f"{bad_shape[0][1]}, expected (2, H, W)")
            elif res is not None and shapes[0][1:] != tuple(res):
                warnings.append(
                    f"{grp} maps are {shapes[0][1:]}, --res is "
                    f"{tuple(res)}")
            valid = [float(s) for s in stamps if s is not None]
            if valid and valid != sorted(valid):
                # h5py visits in insertion order; the cursor assumes sorted
                warnings.append(f"{grp}: timestamps not in visit order "
                                "(window cursor assumes sorted)")
            if valid:
                lo, hi = float(ts[0]), float(ts[-1])
                inside = sum(lo <= s <= hi + 1.0 for s in valid)
                if inside < len(valid) // 2:
                    warnings.append(
                        f"{grp}: only {inside}/{len(valid)} map timestamps "
                        "fall inside the event time span — wrong units?")
    return errors, warnings


STOCK_COMMANDS = """\
# Stock commands once the real datasets land (reference README.md:91-114):
#   datasets/data/MVSEC/  datasets/data/ECD/  datasets/data/HQF/
#   datasets/data/training/   (UZH-FPV train split)
python train_flow.py --config configs/train_SNN.yml          # LIFFireNet
python train_flow.py --config configs/train_ANN.yml          # RecEVFlowNet
python eval_flow.py <runid> --config configs/eval_MVSEC.yml  # AEE/%outlier
python eval_flow.py <runid> --config configs/eval_ECD.yml    # FWL/RSAT
python eval_flow.py <runid> --config configs/eval_HQF.yml    # FWL/RSAT
# Released reference checkpoints evaluate directly via the torch importer:
python eval_flow.py any --config configs/eval_MVSEC.yml \\
    --torch_weights <mlflow-run-dir|model.pth>
# Cross-framework AEE parity (ours vs the unmodified reference CLI):
python tools/aee_parity.py --run <runid> --data datasets/data/MVSEC/..."""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="dataset directory (searched recursively)")
    ap.add_argument("--mode", default="events",
                    choices=["events", "time", "frames",
                             "gtflow_dt1", "gtflow_dt4"])
    ap.add_argument("--res", type=int, nargs=2, default=None,
                    metavar=("H", "W"))
    ap.add_argument("--strict", action="store_true",
                    help="warnings also fail")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(args.root, "**", "*.h5"),
                             recursive=True))
    if not files:
        print(f"FAIL: no .h5 files under {args.root}")
        return 1

    n_err = n_warn = 0
    for path in files:
        errors, warnings = check_file(path, args.mode, args.res)
        rel = os.path.relpath(path, args.root)
        for e in errors:
            print(f"ERROR {rel}: {e}")
        for w in warnings:
            print(f"warn  {rel}: {w}")
        n_err += len(errors)
        n_warn += len(warnings)

    ok = n_err == 0 and (not args.strict or n_warn == 0)
    print(f"{'OK' if ok else 'FAIL'}: {len(files)} file(s), "
          f"{n_err} error(s), {n_warn} warning(s) "
          f"[mode={args.mode}]")
    if ok:
        print()
        print(STOCK_COMMANDS)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

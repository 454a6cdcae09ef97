"""Programmatic-entry contract for the train CLI (fast tier).

The round-4 regression: an unguarded ``args.bf16`` read broke every caller
that builds a bare ``argparse.Namespace`` (the exact-resume test, embedding
users) while the subprocess CLI kept passing. ``train_flow.train()`` now
fills missing attributes from the arg-parser defaults, so a *minimal*
Namespace must always work — this test locks that in with one real update
on a tiny synthetic stream (no dataset, CPU, <10 s).
"""

import argparse

import yaml


def test_train_minimal_namespace(tmp_path):
    import train_flow

    cfg = {
        "experiment": "prog-entry",
        "data": {"mode": "events", "window": 64, "window_loss": 128},
        "model": {
            "name": "FireNet", "encoding": "cnt", "num_bins": 2,
            "base_num_channels": 4, "kernel_size": 3,
            "activations": ["relu", None], "mask_output": True,
            "spiking_neuron": None, "round_encoding": False,
        },
        "loss": {"flow_regul_weight": 0.001, "clip_grad": 100.0,
                 "overwrite_intermediate": False},
        "optimizer": {"name": "Adam", "lr": 0.001},
        "loader": {"n_epochs": 1, "batch_size": 1,
                   "resolution": [16, 16], "augment": [], "seed": 0},
        "vis": {"verbose": False, "store_grads": False},
        "hot_filter": {"enabled": False},
    }
    cfg_path = str(tmp_path / "cfg.yml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    # deliberately omit every optional flag (bf16, vis, profile, cpu, ...):
    # train() must fill them from build_arg_parser()'s defaults
    args = argparse.Namespace(
        config=cfg_path,
        runs_root=str(tmp_path / "runs"),
        synthetic="const",
        max_updates=1,
    )
    runid = train_flow.train(args)
    assert runid
    assert (tmp_path / "runs").exists()


def test_arg_parser_covers_namespace_fields():
    """Every attribute train() reads must exist as a CLI flag so the
    defaults-fill covers it; conversely the parser builds without error."""
    import train_flow

    ap = train_flow.build_arg_parser()
    dests = {a.dest for a in ap._actions}
    for field in ("config", "prev_runid", "runs_root", "synthetic",
                  "native", "resume", "profile", "vis", "max_updates",
                  "dp", "bf16", "cpu"):
        assert field in dests, f"CLI flag for args.{field} missing"
